"""Per-piece device timing of glue variants (separate jit modules)."""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from convolutionalencdec_tpu.params import NASA_K7
from convolutionalencdec_tpu.kernels.acs_swar import (
    _pack_channels, _unpack_out, acs_forward_batch_swar,
    traceback_batch_swar)
from convolutionalencdec_tpu.kernels.acs_pallas import PACK

spec = NASA_K7
B, T = 2048, 2064
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))


@jax.jit
def pack_cur(s):
    return _pack_channels(s)


@jax.jit
def pack_new(s):
    return jax.lax.bitcast_convert_type(
        s.T.reshape(T, B // 4, 4), jnp.int32)


@jax.jit
def pack_new2(s):
    # int32-space transpose: bitcast 4 time steps into one lane first,
    # transpose as i32, then 4x4 byte-transpose... just the transpose
    # half to see the dtype effect.
    s32 = jax.lax.bitcast_convert_type(s.reshape(B, T // 4, 4), jnp.int32)
    return s32.T


decs, _ = acs_forward_batch_swar(spec, pack_cur(seg))
tb32 = traceback_batch_swar(spec, decs, T - 10)
packed_cur = _unpack_out(tb32, B)
L = T - 16


@jax.jit
def unpack_cur(o32):
    return _unpack_out(o32, B)


@jax.jit
def unpack_new(o32):
    TG = o32.shape[0]
    return jax.lax.bitcast_convert_type(
        o32.reshape(TG, B // 4), jnp.uint8).reshape(TG, B)


@jax.jit
def epi_cur(packed):
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = (packed[:, None, :] >> j) & 1
    bits = bits.reshape(-1, packed.shape[-1])
    return bits[:L, :B].T


@jax.jit
def epi_new(packed):
    pt = packed[:, :B].T
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, 1, PACK)
    bits = (pt[:, :, None] >> j) & 1
    return bits.reshape(B, -1)[:, :L]


fns = [("pack_cur", pack_cur, seg), ("pack_new", pack_new, seg),
       ("pack_new2", pack_new2, seg),
       ("unpack_cur", unpack_cur, tb32), ("unpack_new", unpack_new, tb32),
       ("epi_cur", epi_cur, packed_cur), ("epi_new", epi_new, packed_cur)]
for name, f, x in fns:
    jax.block_until_ready(f(x))

jax.profiler.start_trace("/tmp/glue_prof2")
outs = []
for name, f, x in fns:
    for _ in range(8):
        outs.append(f(x))
jax.block_until_ready(outs)
jax.profiler.stop_trace()

files = glob.glob("/tmp/glue_prof2/**/*.trace.json.gz", recursive=True)
for fl in files:
    ev = json.load(gzip.open(fl))["traceEvents"]
    dur = collections.Counter(); cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                key = name.split("(")[0]
                dur[key] += e["dur"]; cnt[key] += 1
    for k in sorted(dur):
        print(f"  {dur[k]/cnt[k]:8.1f} us/call x{cnt[k]:<4d} {k}")
