"""ABI-conformant test lens modules, assembled from scratch.

The reference ships its wasm test modules as Rust/AssemblyScript
SOURCE compiled at test time (/root/reference/tests/modules/Makefile);
this container has no wasm32 toolchain or network, so we assemble
equivalent small modules directly with :mod:`wasm_asm`. Each follows
the reference ABI exactly (sdk-rust/src/lib.rs:42-58, host-go/engine/
module/protocol.go): import ``lens.next() -> i32``, export ``memory``/
``alloc``/``transform`` (+ ``inverse``/``set_param`` where noted),
items framed ``[i8 type][u32le len][payload]`` in linear memory,
type ids −1 err / 0 nil / 1 json / 127 EOS.

Memory discipline: ``transform`` resets the bump allocator at entry —
the input frame is written by the host AFTER that (during the
``next()`` callback), and the previous output has already been copied
out by then, so per-item memory is CONSTANT no matter how many rows
stream through one instance (a long-running executor process must not
grow linear memory per row).

Modules:

- ``rename_simple()`` — byte-level first-occurrence replace of the
  JSON key ``"Name"`` → ``"FullName"`` (the semantics of the
  reference's ``rust_wasm32_simple``, tests/modules/rust_wasm32_simple
  /src/lib.rs); ``inverse`` does the opposite replace. Nil/EOS/error
  frames pass through.
- ``counter()`` — stateful: emits ``{"count":N}`` for the N-th json
  input seen by the instance (≙ ``rust_wasm32_counter``'s
  state-across-calls contract).
- ``echo_param()`` — ``set_param`` stashes the params json; each json
  input is replaced by the stashed params (proves the host's
  set_param framing round-trips byte-exactly).
"""

from __future__ import annotations

from lens_spark.wasm.wasm_asm import (
    ADD, AND, DROP, EQ, EQZ, GE_S, GE_U, GT_U, IF_VOID, ELSE, BLOCK_VOID,
    LOOP_VOID, LT_S, LT_U, MEMORY_COPY, MEMORY_GROW, MEMORY_SIZE, MUL, NE,
    RETURN, SELECT, SHR_U, SUB, UNREACHABLE, Func, br, br_if, build_module,
    call, global_get, global_set, i32_const, i32_load, i32_load8_s,
    i32_load8_u, i32_store, i32_store16, i32_store8, local_get, local_set,
    local_tee, uleb,
)

HEAP_BASE = 65536  # bump-allocator start (data segments live below)
_DIV_U, _REM_U = b"\x6e", b"\x70"

# function-local indices shared by the transform bodies
_P, _T, _LEN, _I, _M, _OUT, _OUTLEN, _Q, _J = range(9)


def _alloc_func() -> Func:
    """alloc(size)->ptr: 8-byte-aligned bump allocation off global 0,
    growing memory when the bump passes the current page span."""
    body = (
        global_get(0) + local_tee(1)
        + local_get(0) + i32_const(7) + ADD + i32_const(-8) + AND + ADD
        + global_set(0)
        # if heap > pages*64KiB: memory.grow((heap - span + 65535) >> 16)
        + global_get(0) + MEMORY_SIZE + i32_const(65536) + MUL + GT_U
        + IF_VOID
        + global_get(0) + MEMORY_SIZE + i32_const(65536) + MUL + SUB
        + i32_const(65535) + ADD + i32_const(16) + SHR_U
        + MEMORY_GROW + DROP
        + b"\x0b"  # end if
        + local_get(1)
    )
    return Func(type_idx=0, n_locals=1, body=body, export="alloc")


def _frame_header(outlen_local: int, out_local: int) -> bytes:
    """store8(out, JSON=1); store32(out+1, outlen)."""
    return (local_get(out_local) + i32_const(1) + i32_store8()
            + local_get(out_local) + local_get(outlen_local) + i32_store(1))


def _pull_and_gate() -> bytes:
    """Common prologue: reset heap, p = next(), passthrough any
    non-json frame (nil / EOS / error) by returning its pointer."""
    return (
        i32_const(HEAP_BASE) + global_set(0)
        + call(0) + local_set(_P)
        + local_get(_P) + i32_load8_s() + local_set(_T)
        + local_get(_T) + i32_const(1) + NE
        + IF_VOID + local_get(_P) + RETURN + b"\x0b"
        + local_get(_P) + i32_load(1) + local_set(_LEN)
        + local_get(_P) + i32_const(5) + ADD + local_set(_Q)
    )


def _scan_for(pat_off: int, plen: int) -> bytes:
    """Relocatable fragment: scan the payload at ``_Q``/``_LEN`` for
    the first occurrence of the pattern bytes at ``pat_off``; leaves
    the match offset (or −1) in local ``_M``."""
    return (
        i32_const(-1) + local_set(_M) + i32_const(0) + local_set(_I)
        + BLOCK_VOID                                     # $done
        + LOOP_VOID                                      # $outer
        + local_get(_I) + i32_const(plen) + ADD + local_get(_LEN) + GT_U
        + br_if(1)                                       # → $done
        + i32_const(0) + local_set(_J)
        + BLOCK_VOID                                     # $nomatch
        + LOOP_VOID                                      # $inner
        + local_get(_J) + i32_const(plen) + EQ
        + IF_VOID
        + local_get(_I) + local_set(_M) + br(4)          # → $done
        + b"\x0b"
        + local_get(_Q) + local_get(_I) + ADD + local_get(_J) + ADD
        + i32_load8_u()
        + local_get(_J) + i32_load8_u(pat_off)
        + NE + br_if(1)                                  # → $nomatch
        + local_get(_J) + i32_const(1) + ADD + local_set(_J)
        + br(0)                                          # continue $inner
        + b"\x0b" + b"\x0b"                              # end inner, nomatch
        + local_get(_I) + i32_const(1) + ADD + local_set(_I)
        + br(0)                                          # continue $outer
        + b"\x0b" + b"\x0b"                              # end outer, done
    )


def _replace_body(pat_off: int, plen: int, rep_off: int, rlen: int) -> bytes:
    """transform body: first-occurrence byte replace of the pattern at
    ``pat_off`` (len ``plen``) with the bytes at ``rep_off`` (len
    ``rlen``) inside the json payload; no-match copies unchanged."""
    emit = (
        # outlen = m>=0 ? len + rlen - plen : len
        local_get(_LEN) + i32_const(rlen - plen) + ADD
        + local_get(_LEN)
        + local_get(_M) + i32_const(0) + GE_S + SELECT
        + local_set(_OUTLEN)
        + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
        + local_set(_OUT)
        + _frame_header(_OUTLEN, _OUT)
        + local_get(_M) + i32_const(0) + LT_S
        + IF_VOID
        + local_get(_OUT) + i32_const(5) + ADD + local_get(_Q)
        + local_get(_LEN) + MEMORY_COPY
        + ELSE
        + local_get(_OUT) + i32_const(5) + ADD + local_get(_Q)
        + local_get(_M) + MEMORY_COPY
        + local_get(_OUT) + i32_const(5) + ADD + local_get(_M) + ADD
        + i32_const(rep_off) + i32_const(rlen) + MEMORY_COPY
        + local_get(_OUT) + i32_const(5 + rlen) + ADD + local_get(_M) + ADD
        + local_get(_Q) + local_get(_M) + ADD + i32_const(plen) + ADD
        + local_get(_LEN) + local_get(_M) + SUB + i32_const(plen) + SUB
        + MEMORY_COPY
        + b"\x0b"
        + local_get(_OUT)
    )
    return _pull_and_gate() + _scan_for(pat_off, plen) + emit


def rename_simple() -> bytes:
    """``transform``: '"Name"' → '"FullName"'; ``inverse``: reverse."""
    pat, rep = b'"Name"', b'"FullName"'
    fwd = _replace_body(pat_off=8, plen=len(pat), rep_off=32, rlen=len(rep))
    inv = _replace_body(pat_off=32, plen=len(rep), rep_off=8, rlen=len(pat))
    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(),
               Func(1, 9, fwd, export="transform"),
               Func(1, 9, inv, export="inverse")],
        globals_init=[HEAP_BASE],
        data=[(8, pat), (32, rep)],
    )


def counter() -> bytes:
    """Stateful: the N-th json input yields ``{"count":N}``."""
    prefix = b'{"count":'
    scratch = 48  # decimal digits rendered backwards from scratch+16
    body = (
        _pull_and_gate()
        # ++count (global 1)
        + global_get(1) + i32_const(1) + ADD + global_set(1)
        # render digits backwards; _I = write pos, _J = n
        + i32_const(scratch + 16) + local_set(_I)
        + global_get(1) + local_set(_J)
        + LOOP_VOID
        + local_get(_I) + i32_const(1) + SUB + local_set(_I)
        + local_get(_I)
        + local_get(_J) + i32_const(10) + _REM_U + i32_const(48) + ADD
        + i32_store8()
        + local_get(_J) + i32_const(10) + _DIV_U + local_tee(_J)
        + br_if(0)
        + b"\x0b"
        # outlen = prefix + dlen + '}'
        + i32_const(scratch + 16) + local_get(_I) + SUB + local_set(_M)
        + local_get(_M) + i32_const(len(prefix) + 1) + ADD
        + local_set(_OUTLEN)
        + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
        + local_set(_OUT)
        + _frame_header(_OUTLEN, _OUT)
        + local_get(_OUT) + i32_const(5) + ADD
        + i32_const(8) + i32_const(len(prefix)) + MEMORY_COPY
        + local_get(_OUT) + i32_const(5 + len(prefix)) + ADD
        + local_get(_I) + local_get(_M) + MEMORY_COPY
        + local_get(_OUT) + i32_const(5 + len(prefix)) + ADD
        + local_get(_M) + ADD + i32_const(0x7D) + i32_store8()
        + local_get(_OUT)
    )
    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(), Func(1, 9, body, export="transform")],
        globals_init=[HEAP_BASE, 0],
        data=[(8, prefix)],
    )


def contains_filter(pattern: bytes = b'"keep"') -> bytes:
    """N:1 filter: each ``transform()`` PULLS until it finds a json
    item whose payload contains ``pattern``, and returns that frame
    unchanged (zero-copy — the input frame is already a valid output
    frame). Non-json frames (nil / EOS / error) pass through. This is
    the reference's multi-pull envelope (``rust_wasm32_filter``,
    host-go/engine/pipes/fromPipe.go pull loop): one output may
    consume many inputs, which exercises the host's synchronous
    blocking ``next()`` path more than once per transform call. The
    heap resets before EVERY pull, so an arbitrarily long run of
    rejected items costs constant memory."""
    body = (
        LOOP_VOID                                        # $pull
        + _pull_and_gate()                               # resets heap
        + _scan_for(8, len(pattern))
        + local_get(_M) + i32_const(0) + GE_S
        + IF_VOID
        + local_get(_P) + RETURN
        + b"\x0b"
        + br(0)                                          # pull again
        + b"\x0b"                                        # end $pull
        + b"\x00"                                        # unreachable
    )
    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(), Func(1, 9, body, export="transform")],
        globals_init=[HEAP_BASE],
        data=[(8, pattern)],
    )


def rename_param() -> bytes:
    """PARAMETERIZED rename (≙ ``rust_wasm32_rename``,
    tests/modules/rust_wasm32_rename/src/lib.rs:31-62): ``set_param``
    parses ``{"src": ..., "dst": ...}`` out of the params json
    (byte-level: find the key, skip to the quoted value, stash it) and
    ``transform`` replaces the quoted src key with the quoted dst key;
    a document WITHOUT the src key fails with the reference's error
    text ``property with name '<src>' not found`` as an in-band error
    frame. ``inverse`` renames dst→src. Unlike the fixed-pattern
    ``rename_simple``, the scan/replace here runs against RUNTIME
    buffers (dynamic lengths in globals), so params genuinely change
    module behavior through the host's set_param protocol."""
    # data segments
    ERR_PRE, ERR_PRE_S = b"property with name '", 8
    ERR_SUF, ERR_SUF_S = b"' not found", 32
    KEY_SRC_S, KEY_DST_S = 96, 104
    NOPARAM = b"set_param with string 'src' and 'dst' is required"
    NOPARAM_S = 160
    BADPARAM = b"missing string 'src'/'dst' params"
    BADPARAM_S = 256
    SRC_BUF, DST_BUF, VAL_CAP = 1024, 1536, 400
    # globals: g0 heap, g1 len(quoted src), g2 len(quoted dst)

    def static_err(off: int, n: int, scratch_local: int) -> bytes:
        """alloc + emit an error frame for a static message, return."""
        return (i32_const(n + 5) + call(1) + local_set(scratch_local)
                + local_get(scratch_local) + i32_const(-1) + i32_store8()
                + local_get(scratch_local) + i32_const(n) + i32_store(1)
                + local_get(scratch_local) + i32_const(5) + ADD
                + i32_const(off) + i32_const(n) + MEMORY_COPY
                + local_get(scratch_local) + RETURN)

    # ---- extract(payload, plen, pat_off, patlen, out_off) -> len|-1
    # locals: 0..4 params, 5 i, 6 j, 7 m, 8 pos, 9 n
    PAY, PLN, PAT, PTL, OUT = range(5)
    EI, EJ, EM, EPOS, EN = 5, 6, 7, 8, 9
    extract = (
        # scan payload for the key pattern (dynamic lengths)
        i32_const(-1) + local_set(EM) + i32_const(0) + local_set(EI)
        + BLOCK_VOID + LOOP_VOID
        + local_get(EI) + local_get(PTL) + ADD + local_get(PLN) + GT_U
        + br_if(1)
        + i32_const(0) + local_set(EJ)
        + BLOCK_VOID + LOOP_VOID
        + local_get(EJ) + local_get(PTL) + EQ
        + IF_VOID + local_get(EI) + local_set(EM) + br(4) + b"\x0b"
        + local_get(PAY) + local_get(EI) + ADD + local_get(EJ) + ADD
        + i32_load8_u()
        + local_get(PAT) + local_get(EJ) + ADD + i32_load8_u()
        + NE + br_if(1)
        + local_get(EJ) + i32_const(1) + ADD + local_set(EJ) + br(0)
        + b"\x0b" + b"\x0b"
        + local_get(EI) + i32_const(1) + ADD + local_set(EI) + br(0)
        + b"\x0b" + b"\x0b"
        + local_get(EM) + i32_const(0) + LT_S
        + IF_VOID + i32_const(-1) + RETURN + b"\x0b"
        # pos = after key; skip to ':' then to the value's opening '"'
        + local_get(PAY) + local_get(EM) + ADD + local_get(PTL) + ADD
        + local_set(EPOS)
        + BLOCK_VOID + LOOP_VOID
        + local_get(EPOS) + local_get(PAY) + local_get(PLN) + ADD + GE_U
        + IF_VOID + i32_const(-1) + RETURN + b"\x0b"
        + local_get(EPOS) + i32_load8_u() + i32_const(0x22) + EQ
        + br_if(1)
        + local_get(EPOS) + i32_const(1) + ADD + local_set(EPOS) + br(0)
        + b"\x0b" + b"\x0b"
        # copy value bytes (no escape support) until the closing '"'
        + local_get(OUT) + i32_const(0x22) + i32_store8()
        + i32_const(0) + local_set(EN)
        + BLOCK_VOID + LOOP_VOID
        + local_get(EPOS) + i32_const(1) + ADD + local_get(EN) + ADD
        + local_get(PAY) + local_get(PLN) + ADD + GE_U
        + IF_VOID + i32_const(-1) + RETURN + b"\x0b"
        + local_get(EN) + i32_const(VAL_CAP) + GT_U
        + IF_VOID + i32_const(-1) + RETURN + b"\x0b"
        + local_get(EPOS) + i32_const(1) + ADD + local_get(EN) + ADD
        + i32_load8_u() + i32_const(0x22) + EQ
        + br_if(1)
        + local_get(OUT) + i32_const(1) + ADD + local_get(EN) + ADD
        + local_get(EPOS) + i32_const(1) + ADD + local_get(EN) + ADD
        + i32_load8_u() + i32_store8()
        + local_get(EN) + i32_const(1) + ADD + local_set(EN) + br(0)
        + b"\x0b" + b"\x0b"
        + local_get(OUT) + i32_const(1) + ADD + local_get(EN) + ADD
        + i32_const(0x22) + i32_store8()
        + local_get(EN) + i32_const(2) + ADD
    )

    # ---- set_param(ptr) -> ptr  (locals: 0 param, 1 len, 2 r)
    set_param = (
        local_get(0) + i32_load(1) + local_set(1)
        + local_get(0) + i32_const(5) + ADD + local_get(1)
        + i32_const(KEY_SRC_S) + i32_const(5) + i32_const(SRC_BUF)
        + call(5) + local_set(2)
        + local_get(2) + i32_const(0) + LT_S
        + IF_VOID + static_err(BADPARAM_S, len(BADPARAM), 2) + b"\x0b"
        + local_get(2) + global_set(1)
        + local_get(0) + i32_const(5) + ADD + local_get(1)
        + i32_const(KEY_DST_S) + i32_const(5) + i32_const(DST_BUF)
        + call(5) + local_set(2)
        + local_get(2) + i32_const(0) + LT_S
        + IF_VOID + static_err(BADPARAM_S, len(BADPARAM), 2) + b"\x0b"
        + local_get(2) + global_set(2)
        + i32_const(0)  # nil ptr (zeroed memory at 0)
    )

    # ---- transform / inverse (dynamic-pattern replace)
    # locals 0-8 as the shared constants, 9 patlen, 10 replen,
    # 11 patbase, 12 repbase
    _PL, _RL, _PB, _RB = 9, 10, 11, 12

    def dyn_body(swap: bool) -> bytes:
        pat_b, rep_b = (DST_BUF, SRC_BUF) if swap else (SRC_BUF, DST_BUF)
        pat_g, rep_g = (2, 1) if swap else (1, 2)
        return (
            _pull_and_gate()
            + global_get(pat_g) + local_set(_PL)
            + global_get(rep_g) + local_set(_RL)
            + i32_const(pat_b) + local_set(_PB)
            + i32_const(rep_b) + local_set(_RB)
            + local_get(_PL) + EQZ
            + IF_VOID + static_err(NOPARAM_S, len(NOPARAM), _OUT) + b"\x0b"
            # dynamic scan (same shape as _scan_for, runtime lengths)
            + i32_const(-1) + local_set(_M) + i32_const(0) + local_set(_I)
            + BLOCK_VOID + LOOP_VOID
            + local_get(_I) + local_get(_PL) + ADD + local_get(_LEN) + GT_U
            + br_if(1)
            + i32_const(0) + local_set(_J)
            + BLOCK_VOID + LOOP_VOID
            + local_get(_J) + local_get(_PL) + EQ
            + IF_VOID + local_get(_I) + local_set(_M) + br(4) + b"\x0b"
            + local_get(_Q) + local_get(_I) + ADD + local_get(_J) + ADD
            + i32_load8_u()
            + local_get(_PB) + local_get(_J) + ADD + i32_load8_u()
            + NE + br_if(1)
            + local_get(_J) + i32_const(1) + ADD + local_set(_J) + br(0)
            + b"\x0b" + b"\x0b"
            + local_get(_I) + i32_const(1) + ADD + local_set(_I) + br(0)
            + b"\x0b" + b"\x0b"
            + local_get(_M) + i32_const(0) + LT_S
            + IF_VOID
            # "property with name '<src>' not found" error frame
            + local_get(_PL) + i32_const(len(ERR_PRE) + len(ERR_SUF) - 2)
            + ADD + local_set(_OUTLEN)  # pre + (plen-2) + suf
            + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
            + local_set(_OUT)
            + local_get(_OUT) + i32_const(-1) + i32_store8()
            + local_get(_OUT) + local_get(_OUTLEN) + i32_store(1)
            + local_get(_OUT) + i32_const(5) + ADD
            + i32_const(ERR_PRE_S) + i32_const(len(ERR_PRE)) + MEMORY_COPY
            + local_get(_OUT) + i32_const(5 + len(ERR_PRE)) + ADD
            + local_get(_PB) + i32_const(1) + ADD
            + local_get(_PL) + i32_const(2) + SUB + MEMORY_COPY
            + local_get(_OUT) + i32_const(3 + len(ERR_PRE)) + ADD
            + local_get(_PL) + ADD  # 5 + pre + (plen-2)
            + i32_const(ERR_SUF_S) + i32_const(len(ERR_SUF)) + MEMORY_COPY
            + local_get(_OUT) + RETURN
            + b"\x0b"
            # replace: outlen = len - plen + rlen
            + local_get(_LEN) + local_get(_RL) + ADD + local_get(_PL) + SUB
            + local_set(_OUTLEN)
            + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
            + local_set(_OUT)
            + _frame_header(_OUTLEN, _OUT)
            + local_get(_OUT) + i32_const(5) + ADD + local_get(_Q)
            + local_get(_M) + MEMORY_COPY
            + local_get(_OUT) + i32_const(5) + ADD + local_get(_M) + ADD
            + local_get(_RB) + local_get(_RL) + MEMORY_COPY
            + local_get(_OUT) + i32_const(5) + ADD + local_get(_M) + ADD
            + local_get(_RL) + ADD
            + local_get(_Q) + local_get(_M) + ADD + local_get(_PL) + ADD
            + local_get(_LEN) + local_get(_M) + SUB + local_get(_PL) + SUB
            + MEMORY_COPY
            + local_get(_OUT)
        )

    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F]),
               ([0x7F] * 5, [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(),
               Func(1, 13, dyn_body(False), export="transform"),
               Func(1, 13, dyn_body(True), export="inverse"),
               Func(0, 2, set_param, export="set_param"),
               Func(2, 5, extract)],
        globals_init=[HEAP_BASE, 0, 0],
        data=[(ERR_PRE_S, ERR_PRE), (ERR_SUF_S, ERR_SUF),
              (KEY_SRC_S, b'"src"'), (KEY_DST_S, b'"dst"'),
              (NOPARAM_S, NOPARAM), (BADPARAM_S, BADPARAM)],
    )


def add_age(magnitude: int = 1, key: str = "Age") -> bytes:
    """M2 semantics (≙ ``rust_wasm32_simple2``, tests/modules/
    rust_wasm32_simple2/src/lib.rs:9-57): ``transform`` parses the
    decimal digits after ``"<key>":`` and splices back the value plus
    ``magnitude``; ``inverse`` subtracts — a bidirectional numeric
    update running INSIDE wasm (parse → arithmetic → re-render), not a
    host-side shortcut. Docs without the key pass through unchanged.
    Negative results render with a leading '-'."""
    pat = f'"{key}":'.encode("utf-8")
    scratch = 48  # digits rendered backwards from scratch+24

    def body(delta: int) -> bytes:
        # locals: shared 0-8; 9 = parsed value; 10 = digit cursor;
        # 11 = digits start (in payload); 12 = digits end (exclusive)
        _V, _C, _DS, _DE = 9, 10, 11, 12
        return (
            _pull_and_gate()
            + _scan_for(8, len(pat))
            + local_get(_M) + i32_const(0) + LT_S
            + IF_VOID + local_get(_P) + RETURN + b"\x0b"  # no Age: as-is
            # digits start after the pattern (skip spaces), sign aware
            + local_get(_Q) + local_get(_M) + ADD + i32_const(len(pat))
            + ADD + local_set(_DS)
            + BLOCK_VOID + LOOP_VOID                      # skip spaces
            + local_get(_DS) + i32_load8_u() + i32_const(0x20) + NE
            + br_if(1)
            + local_get(_DS) + i32_const(1) + ADD + local_set(_DS) + br(0)
            + b"\x0b" + b"\x0b"
            + i32_const(0) + local_set(_V)
            + i32_const(0) + local_set(_J)                # sign flag
            + local_get(_DS) + i32_load8_u() + i32_const(0x2D) + EQ
            + IF_VOID
            + i32_const(1) + local_set(_J)
            + local_get(_DS) + i32_const(1) + ADD + local_set(_DS)
            + b"\x0b"
            + local_get(_DS) + local_set(_DE)
            + BLOCK_VOID + LOOP_VOID                      # parse digits
            + local_get(_DE) + i32_load8_u() + i32_const(0x30) + LT_U
            + br_if(1)
            + local_get(_DE) + i32_load8_u() + i32_const(0x39) + GT_U
            + br_if(1)
            + local_get(_V) + i32_const(10) + MUL
            + local_get(_DE) + i32_load8_u() + i32_const(0x30) + SUB + ADD
            + local_set(_V)
            + local_get(_DE) + i32_const(1) + ADD + local_set(_DE) + br(0)
            + b"\x0b" + b"\x0b"
            # v = (sign ? -v : v) + delta
            + i32_const(0) + local_get(_V) + SUB
            + local_get(_V)
            + local_get(_J) + SELECT
            + i32_const(delta) + ADD + local_set(_V)
            # render |v| backwards at scratch+24; sign handled below
            + local_get(_V) + i32_const(0) + LT_S + local_set(_J)
            + i32_const(0) + local_get(_V) + SUB
            + local_get(_V)
            + local_get(_J) + SELECT + local_set(_V)
            + i32_const(scratch + 24) + local_set(_C)
            + LOOP_VOID
            + local_get(_C) + i32_const(1) + SUB + local_set(_C)
            + local_get(_C)
            + local_get(_V) + i32_const(10) + _REM_U + i32_const(0x30) + ADD
            + i32_store8()
            + local_get(_V) + i32_const(10) + _DIV_U + local_tee(_V)
            + br_if(0)
            + b"\x0b"
            + local_get(_J)
            + IF_VOID
            + local_get(_C) + i32_const(1) + SUB + local_set(_C)
            + local_get(_C) + i32_const(0x2D) + i32_store8()
            + b"\x0b"
            # splice: prefix [q, _DS_digits_start... careful: prefix is
            # everything before the ORIGINAL number (incl. any '-'),
            # which begins where space-skipping stopped — recompute:
            # original number span = [numstart, _DE); numstart =
            # _DS minus (1 if original had '-'), but _DS was advanced
            # past '-'; the prefix end is simpler: scan the payload up
            # to _DS, then back over an optional '-'.
            + local_get(_DS) + i32_const(1) + SUB + i32_load8_u()
            + i32_const(0x2D) + EQ
            + IF_VOID
            + local_get(_DS) + i32_const(1) + SUB + local_set(_DS)
            + b"\x0b"                                     # prefix end = _DS
            # outlen = (prefix) + rendered + (suffix)
            + local_get(_DS) + local_get(_Q) + SUB        # prefix len
            + i32_const(scratch + 24) + local_get(_C) + SUB + ADD
            + local_get(_Q) + local_get(_LEN) + ADD + local_get(_DE)
            + SUB + ADD
            + local_set(_OUTLEN)
            + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
            + local_set(_OUT)
            + _frame_header(_OUTLEN, _OUT)
            + local_get(_OUT) + i32_const(5) + ADD
            + local_get(_Q)
            + local_get(_DS) + local_get(_Q) + SUB + MEMORY_COPY
            + local_get(_OUT) + i32_const(5) + ADD
            + local_get(_DS) + local_get(_Q) + SUB + ADD
            + local_get(_C)
            + i32_const(scratch + 24) + local_get(_C) + SUB + MEMORY_COPY
            + local_get(_OUT) + i32_const(5) + ADD
            + local_get(_DS) + local_get(_Q) + SUB + ADD
            + i32_const(scratch + 24) + local_get(_C) + SUB + ADD
            + local_get(_DE)
            + local_get(_Q) + local_get(_LEN) + ADD + local_get(_DE) + SUB
            + MEMORY_COPY
            + local_get(_OUT)
        )

    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(),
               Func(1, 13, body(int(magnitude)), export="transform"),
               Func(1, 13, body(-int(magnitude)), export="inverse")],
        globals_init=[HEAP_BASE],
        data=[(8, pat)],
    )


def explode_books() -> bytes:
    """M7 semantics (≙ ``rust_wasm32_normalize``, tests/modules/
    rust_wasm32_normalize/src/lib.rs:30-77): un-nest
    ``{"Books": ["a", "b"]}`` into one ``{"Book": "a"}`` per element —
    the 1:N envelope. The module BUFFERS the array remainder in fixed
    memory across calls and each ``transform()`` returns the next
    element WITHOUT pulling (the one cardinality class no other
    fixture exercises); when the buffer drains it pulls the next
    input. Docs without a ``Books`` array are skipped (pull again,
    like the reference's nil handling); elements are unescaped quoted
    strings."""
    pat = b'"Books"'
    OUT_PRE, OUT_PRE_S = b'{"Book":"', 32
    PEND, PEND_CAP = 1024, 30000
    TOOBIG, TOOBIG_S = b"Books array exceeds the pending buffer", 64
    # globals: g0 heap, g1 cursor (0 = drained), g2 end
    _POS, _E = 9, 10
    body = (
        i32_const(HEAP_BASE) + global_set(0)
        + LOOP_VOID                                       # $main
        + global_get(1) + EQZ + EQZ                       # pending?
        + IF_VOID
        # ---- emit next element from [g1, g2)
        + global_get(1) + local_set(_POS)
        + BLOCK_VOID                                      # $drained
        + BLOCK_VOID + LOOP_VOID                          # find open "
        + local_get(_POS) + global_get(2) + GE_U + br_if(2)  # → drained
        + local_get(_POS) + i32_load8_u() + i32_const(0x5D) + EQ
        + br_if(2)                                        # ']' → drained
        + local_get(_POS) + i32_load8_u() + i32_const(0x22) + EQ
        + br_if(1)                                        # found
        + local_get(_POS) + i32_const(1) + ADD + local_set(_POS) + br(0)
        + b"\x0b" + b"\x0b"
        # closing quote
        + local_get(_POS) + i32_const(1) + ADD + local_tee(_POS)
        + local_set(_E)
        + BLOCK_VOID + LOOP_VOID
        + local_get(_E) + global_get(2) + GE_U + br_if(2)  # → drained
        + local_get(_E) + i32_load8_u() + i32_const(0x22) + EQ
        + br_if(1)
        + local_get(_E) + i32_const(1) + ADD + local_set(_E) + br(0)
        + b"\x0b" + b"\x0b"
        # emit {"Book":"<elem>"} ; advance cursor past closing quote
        + local_get(_E) + i32_const(1) + ADD + global_set(1)
        + local_get(_E) + local_get(_POS) + SUB
        + i32_const(len(OUT_PRE) + 2) + ADD + local_set(_OUTLEN)
        + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
        + local_set(_OUT)
        + _frame_header(_OUTLEN, _OUT)
        + local_get(_OUT) + i32_const(5) + ADD
        + i32_const(OUT_PRE_S) + i32_const(len(OUT_PRE)) + MEMORY_COPY
        + local_get(_OUT) + i32_const(5 + len(OUT_PRE)) + ADD
        + local_get(_POS)
        + local_get(_E) + local_get(_POS) + SUB + MEMORY_COPY
        + local_get(_OUT) + local_get(_OUTLEN) + ADD
        + i32_const(3) + ADD                              # out+5+outlen-2
        + i32_const(0x7D22) + i32_store16()               # '"' then '}' (LE)
        + local_get(_OUT) + RETURN
        + b"\x0b"                                         # end $drained
        + i32_const(0) + global_set(1)                    # drained
        + b"\x0b"                                         # end IF pending
        # ---- pull the next input
        + call(0) + local_set(_P)
        + local_get(_P) + i32_load8_s() + local_set(_T)
        + local_get(_T) + i32_const(1) + NE
        + IF_VOID + local_get(_P) + RETURN + b"\x0b"      # nil/EOS/err
        + local_get(_P) + i32_load(1) + local_set(_LEN)
        + local_get(_P) + i32_const(5) + ADD + local_set(_Q)
        + _scan_for(8, len(pat))
        + local_get(_M) + i32_const(0) + GE_S
        + IF_VOID
        # skip to '[' then stash the remainder into PEND
        + local_get(_Q) + local_get(_M) + ADD + i32_const(len(pat)) + ADD
        + local_set(_POS)
        + BLOCK_VOID + LOOP_VOID
        + local_get(_POS) + local_get(_Q) + local_get(_LEN) + ADD + GE_U
        + br_if(1)
        + local_get(_POS) + i32_load8_u() + i32_const(0x5B) + EQ
        + br_if(1)
        + local_get(_POS) + i32_const(1) + ADD + local_set(_POS) + br(0)
        + b"\x0b" + b"\x0b"
        + local_get(_Q) + local_get(_LEN) + ADD + local_get(_POS) + SUB
        + i32_const(PEND_CAP) + GT_U
        + IF_VOID
        + i32_const(len(TOOBIG) + 5) + call(1) + local_set(_OUT)
        + local_get(_OUT) + i32_const(-1) + i32_store8()
        + local_get(_OUT) + i32_const(len(TOOBIG)) + i32_store(1)
        + local_get(_OUT) + i32_const(5) + ADD
        + i32_const(TOOBIG_S) + i32_const(len(TOOBIG)) + MEMORY_COPY
        + local_get(_OUT) + RETURN
        + b"\x0b"
        + i32_const(PEND) + local_get(_POS)
        + local_get(_Q) + local_get(_LEN) + ADD + local_get(_POS) + SUB
        + MEMORY_COPY
        + i32_const(PEND) + global_set(1)
        + i32_const(PEND)
        + local_get(_Q) + local_get(_LEN) + ADD + local_get(_POS) + SUB
        + ADD + global_set(2)
        + b"\x0b"                                         # end IF found
        + br(0)                                           # continue $main
        + b"\x0b"                                         # end $main
        + UNREACHABLE
    )
    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(), Func(1, 11, body, export="transform")],
        globals_init=[HEAP_BASE, 0, 0],
        data=[(8, pat), (OUT_PRE_S, OUT_PRE), (TOOBIG_S, TOOBIG)],
    )


PARAM_OFF = 8192  # echo_param stash (length in global 1)


def echo_param() -> bytes:
    """``set_param`` stashes the params json; ``transform`` replaces
    each json input with the stashed bytes (1 in : 1 out)."""
    err = b"params too large"
    set_param = (
        # local 0 = frame ptr; guard the fixed stash region
        local_get(0) + i32_load(1) + i32_const(32768) + GT_U
        + IF_VOID
        # error frame: [-1][len][msg] at the heap base
        + i32_const(len(err) + 5) + call(1) + local_set(1)
        + local_get(1) + i32_const(-1) + i32_store8()
        + local_get(1) + i32_const(len(err)) + i32_store(1)
        + local_get(1) + i32_const(5) + ADD
        + i32_const(8) + i32_const(len(err)) + MEMORY_COPY
        + local_get(1) + RETURN
        + b"\x0b"
        + local_get(0) + i32_load(1) + global_set(1)
        + i32_const(PARAM_OFF) + local_get(0) + i32_const(5) + ADD
        + global_get(1) + MEMORY_COPY
        + i32_const(0)  # nil ptr (memory at 0 is zeroed → nil frame)
    )
    body = (
        _pull_and_gate()
        + global_get(1) + local_set(_OUTLEN)
        + local_get(_OUTLEN) + i32_const(5) + ADD + call(1)
        + local_set(_OUT)
        + _frame_header(_OUTLEN, _OUT)
        + local_get(_OUT) + i32_const(5) + ADD
        + i32_const(PARAM_OFF) + local_get(_OUTLEN) + MEMORY_COPY
        + local_get(_OUT)
    )
    return build_module(
        types=[([0x7F], [0x7F]), ([], [0x7F])],
        imports=[("lens", "next", 1)],
        funcs=[_alloc_func(),
               Func(1, 9, body, export="transform"),
               Func(0, 1, set_param, export="set_param")],
        globals_init=[HEAP_BASE, 0],
        data=[(8, err)],
    )


_ = uleb  # re-exported for tests building custom modules
