"""Minimal WebAssembly binary emitter — enough of the public wasm
core spec (binary format, §5) to assemble small test lens modules
without any toolchain (this container has no wasm32 rust-std, no
network for crates.io/npm, and no wat2wasm — but Node's built-in
``WebAssembly`` can RUN modules, so we emit the bytes ourselves).

Used by :mod:`lens_spark.wasm.testmods` to build ABI-conformant lens
modules for the wasm host's tests; it is NOT a general compiler. The
encoding (LEB128, section ids, opcode bytes) follows the W3C
WebAssembly Core Specification; the module ABI it targets is the
reference lens ABI (/root/reference/host-go/engine/module/protocol.go,
/root/reference/sdk-rust/src/lib.rs:42-58): export ``memory`` /
``alloc`` / ``transform`` (+ optional ``inverse`` / ``set_param``),
import ``lens.next``, items framed ``[i8 type][u32le len][payload]``.
"""

from __future__ import annotations

# ---- value/encoding primitives --------------------------------------------

I32 = 0x7F  # valtype


def uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not (b & 0x40)) or (n == -1 and (b & 0x40)):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def _vec(items: list[bytes]) -> bytes:
    return uleb(len(items)) + b"".join(items)


def _section(sid: int, content: bytes) -> bytes:
    return bytes([sid]) + uleb(len(content)) + content


def _name(s: str) -> bytes:
    b = s.encode("utf-8")
    return uleb(len(b)) + b


# ---- instruction helpers (only what the test modules need) ----------------

END = b"\x0b"


def i32_const(v: int) -> bytes:
    # i32.const takes a signed-LEB immediate; normalize u32 to s32
    if v >= 1 << 31:
        v -= 1 << 32
    return b"\x41" + sleb(v)


def local_get(i: int) -> bytes:
    return b"\x20" + uleb(i)


def local_set(i: int) -> bytes:
    return b"\x21" + uleb(i)


def local_tee(i: int) -> bytes:
    return b"\x22" + uleb(i)


def global_get(i: int) -> bytes:
    return b"\x23" + uleb(i)


def global_set(i: int) -> bytes:
    return b"\x24" + uleb(i)


def call(i: int) -> bytes:
    return b"\x10" + uleb(i)


def _mem(op: int, align: int = 0, offset: int = 0) -> bytes:
    return bytes([op]) + uleb(align) + uleb(offset)


def i32_load(offset: int = 0) -> bytes:
    return _mem(0x28, 0, offset)


def i32_load8_s(offset: int = 0) -> bytes:
    return _mem(0x2C, 0, offset)


def i32_load8_u(offset: int = 0) -> bytes:
    return _mem(0x2D, 0, offset)


def i32_load16_u(offset: int = 0) -> bytes:
    return _mem(0x2F, 0, offset)


def i32_store(offset: int = 0) -> bytes:
    return _mem(0x36, 0, offset)


def i32_store8(offset: int = 0) -> bytes:
    return _mem(0x3A, 0, offset)


def i32_store16(offset: int = 0) -> bytes:
    return _mem(0x3B, 0, offset)


MEMORY_SIZE = b"\x3f\x00"
MEMORY_GROW = b"\x40\x00"
MEMORY_COPY = b"\xfc\x0a\x00\x00"  # bulk-memory; supported by Node/V8

ADD, SUB, MUL = b"\x6a", b"\x6b", b"\x6c"
AND, OR, SHL, SHR_U = b"\x71", b"\x72", b"\x74", b"\x76"
EQ, NE, EQZ = b"\x46", b"\x47", b"\x45"
LT_S, LT_U, GT_S, GT_U = b"\x48", b"\x49", b"\x4a", b"\x4b"
LE_U, GE_U, GE_S = b"\x4d", b"\x4f", b"\x4e"
RETURN, DROP, SELECT = b"\x0f", b"\x1a", b"\x1b"
UNREACHABLE = b"\x00"

BLOCK_VOID = b"\x02\x40"
LOOP_VOID = b"\x03\x40"
IF_VOID = b"\x04\x40"
ELSE = b"\x05"


def br(depth: int) -> bytes:
    return b"\x0c" + uleb(depth)


def br_if(depth: int) -> bytes:
    return b"\x0d" + uleb(depth)


# ---- module assembly -------------------------------------------------------


class Func:
    """A module-defined function: type index, extra locals (all i32),
    and a raw instruction-byte body (END appended automatically)."""

    def __init__(self, type_idx: int, n_locals: int, body: bytes,
                 export: str | None = None):
        self.type_idx = type_idx
        self.n_locals = n_locals
        self.body = body
        self.export = export


def build_module(*, types: list[tuple[list[int], list[int]]],
                 imports: list[tuple[str, str, int]],
                 funcs: list[Func],
                 mem_pages: int = 2,
                 globals_init: list[int] = (),
                 data: list[tuple[int, bytes]] = ()) -> bytes:
    """Assemble a wasm module. ``types`` are (params, results) valtype
    lists; ``imports`` are (module, name, type_idx) function imports
    (indexed before defined funcs, per the spec); ``globals_init`` are
    mutable i32 globals with their init values; ``data`` are active
    segments (offset, bytes). Memory is always exported as "memory"."""
    type_sec = _vec([
        b"\x60" + _vec([bytes([t]) for t in ps]) + _vec([bytes([t]) for t in rs])
        for ps, rs in types])
    import_sec = _vec([
        _name(m) + _name(n) + b"\x00" + uleb(ti) for m, n, ti in imports])
    func_sec = _vec([uleb(f.type_idx) for f in funcs])
    mem_sec = _vec([b"\x00" + uleb(mem_pages)])
    global_sec = _vec([
        bytes([I32, 0x01]) + i32_const(v) + END for v in globals_init])
    exports = [_name("memory") + b"\x02" + uleb(0)]
    for i, f in enumerate(funcs):
        if f.export:
            exports.append(_name(f.export) + b"\x00" + uleb(len(imports) + i))
    export_sec = _vec(exports)
    bodies = []
    for f in funcs:
        locals_decl = _vec([uleb(f.n_locals) + bytes([I32])] if f.n_locals
                           else [])
        code = locals_decl + f.body + END
        bodies.append(uleb(len(code)) + code)
    code_sec = _vec(bodies)
    data_sec = _vec([
        b"\x00" + i32_const(off) + END + uleb(len(b)) + b
        for off, b in data])

    out = b"\x00asm\x01\x00\x00\x00"
    out += _section(1, type_sec)
    if imports:
        out += _section(2, import_sec)
    out += _section(3, func_sec)
    out += _section(5, mem_sec)
    if globals_init:
        out += _section(6, global_sec)
    out += _section(7, export_sec)
    out += _section(10, code_sec)
    if data:
        out += _section(11, data_sec)
    return out
