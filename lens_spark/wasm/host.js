// WASM lens host — Node side.
//
// Runs ONE lens-module instance and streams items through it over
// stdin/stdout, using the reference lens ABI end to end
// (/root/reference/host-go/engine/module/protocol.go,
//  /root/reference/host-go/runtimes/wasmtime/runtime.go:60-170):
//   module exports: memory, alloc(i32)->i32, <fn>()->i32,
//                   optional set_param(i32)->i32
//   module imports: one function (canonically lens.next() -> i32)
//   frames (in wasm memory AND on our pipes): [i8 type][u32le len]
//   [payload]; nil(0) and EOS(127) are the type byte alone;
//   err(-1) payload is the message, json(1) payload is the item.
//
// Protocol with the Python parent: parent writes input frames to our
// stdin (ending with EOS); we write each transform() output frame to
// stdout and exit after emitting EOS. The module PULLS — when wasm
// calls next() we do a BLOCKING read of one frame from stdin, so a
// stage may consume 0..N inputs per output and hold state across
// calls, exactly like the reference's fromPipe.
//
// usage: node host.js <module.wasm> <fnName> [paramsJsonBase64]

"use strict";
const fs = require("fs");

const EOS = 127, NIL = 0, JSON_ID = 1, ERR = -1;

function fail(msg) {
  // in-band error frame on stdout, then a clean exit: the Python side
  // raises it as a LensError (reference TypeId=-1 semantics)
  const payload = Buffer.from(String(msg), "utf8");
  const frame = Buffer.alloc(5 + payload.length);
  frame.writeInt8(ERR, 0);
  frame.writeUInt32LE(payload.length, 1);
  payload.copy(frame, 5);
  writeAll(frame);
  process.exit(0);
}

function writeAll(buf) {
  let off = 0;
  while (off < buf.length) off += fs.writeSync(1, buf, off, buf.length - off);
}

function readExact(n) {
  const buf = Buffer.alloc(n);
  let off = 0;
  while (off < n) {
    let r;
    try {
      r = fs.readSync(0, buf, off, n - off, null);
    } catch (e) {
      if (e.code === "EAGAIN") continue; // non-blocking stdin quirk
      throw e;
    }
    if (r === 0) throw new Error("unexpected EOF on stdin");
    off += r;
  }
  return buf;
}

function readFrame() {
  const typeId = readExact(1).readInt8(0);
  if (typeId === NIL || typeId === EOS) return { typeId, payload: null };
  const len = readExact(4).readUInt32LE(0);
  return { typeId, payload: readExact(len) };
}

const wasmPath = process.argv[2];
const fnName = process.argv[3] || "transform";
const paramsB64 = process.argv[4] || "";

let memory, alloc;

// Write a frame into wasm linear memory via the module's own alloc
// (the host-side getNext contract: alloc exactly the frame length,
// copy, return the pointer).
function frameToWasm(typeId, payload) {
  const total = payload === null ? 1 : 5 + payload.length;
  const ptr = alloc(total) >>> 0;
  const mem = Buffer.from(memory.buffer, ptr, total);
  mem.writeInt8(typeId, 0);
  if (payload !== null) {
    mem.writeUInt32LE(payload.length, 1);
    payload.copy(mem, 5);
  }
  return ptr;
}

function frameFromWasm(ptr) {
  ptr = ptr >>> 0;
  const dv = new DataView(memory.buffer);
  const typeId = dv.getInt8(ptr);
  if (typeId === NIL || typeId === EOS) return { typeId, payload: null };
  const len = dv.getUint32(ptr + 1, true);
  // copy out: the buffer may detach on the next memory.grow
  return { typeId, payload: Buffer.from(Buffer.from(memory.buffer, ptr + 5, len)) };
}

function nextImport() {
  const { typeId, payload } = readFrame();
  return frameToWasm(typeId, payload) | 0;
}

let instance;
try {
  const mod = new WebAssembly.Module(fs.readFileSync(wasmPath));
  // the reference hosts bind imports positionally (wasmtime-go
  // NewInstance extern list), so accept any import module name for
  // the single next() function
  const importObject = {};
  for (const imp of WebAssembly.Module.imports(mod)) {
    if (imp.kind === "function") {
      (importObject[imp.module] = importObject[imp.module] || {})[imp.name] =
        nextImport;
    }
  }
  instance = new WebAssembly.Instance(mod, importObject);
} catch (e) {
  fail(`failed to instantiate wasm module: ${e.message}`);
}

memory = instance.exports.memory;
alloc = instance.exports.alloc;
const fn = instance.exports[fnName];
if (!memory) fail("Export `memory` does not exist");
if (!alloc) fail("Export `alloc` does not exist");
if (!fn) fail(`Export \`${fnName}\` does not exist`);

if (paramsB64) {
  const setParam = instance.exports.set_param;
  if (!setParam) fail("Export `set_param` does not exist");
  try {
    const ptr = frameToWasm(JSON_ID, Buffer.from(paramsB64, "base64"));
    const ret = setParam(ptr);
    const { typeId, payload } = frameFromWasm(ret);
    if (typeId === ERR) fail(`set_param: ${payload.toString("utf8")}`);
  } catch (e) {
    fail(`set_param trapped: ${e.message}`);
  }
}

// pull loop: every transform() yields one output frame; EOS ends
for (;;) {
  let ptr;
  try {
    ptr = fn();
  } catch (e) {
    fail(`${fnName} trapped: ${e.message}`);
  }
  const { typeId, payload } = frameFromWasm(ptr);
  if (typeId === NIL || typeId === EOS) {
    writeAll(Buffer.from([typeId]));
    if (typeId === EOS) break;
    continue;
  }
  const frame = Buffer.alloc(5 + payload.length);
  frame.writeInt8(typeId, 0);
  frame.writeUInt32LE(payload.length, 1);
  payload.copy(frame, 5);
  writeAll(frame);
  if (typeId === ERR) break; // reference hosts stop the pipe on error
}
process.exit(0);
