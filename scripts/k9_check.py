"""Validate the NS>=256 one-vreg tile dispatch on the real chip:
K=9 decode bit-exact vs scan, plus before/after style timings for
K=9 and K=7 (K=7 must be unchanged — tile_lanes leaves NS=64 at 256)."""
import sys, glob, gzip, json, collections, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K
from convolutionalencdec_tpu.params import K9_561_753, NASA_K7

rng = np.random.default_rng(7)


def check(spec, name):
    B, T = 512, 2040
    L = T - spec.S
    msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
    coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
    flip = rng.random(coded.shape) < 0.03
    coded ^= (flip * rng.integers(1, 2 ** spec.n, coded.shape)).astype(np.uint8)
    out = np.asarray(K.viterbi_decode_batch(spec, jnp.asarray(coded)))
    scan = np.asarray(jax.vmap(lambda s: fec.viterbi_decode(spec, s))(jnp.asarray(coded[:8])))
    assert (out[:8] == scan).all(), f"{name}: kernel != scan"
    # Residual BER over all message bits (includes flips beyond the
    # code's correction power — a sanity magnitude, not a gate).
    ber = (out != msgs).mean()
    print(f"{name}: kernel == scan on {scan.shape[0]} channels; "
          f"residual BER {ber:.2e} at 3% segment corruption")


check(K9_561_753, "K9 hard")
check(NASA_K7, "K7 hard")

# timing (profiler device truth)
for name, spec in [("K9", K9_561_753), ("K7", NASA_K7)]:
    B, T = 2048, 2064
    seg = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
    dec = jax.jit(lambda c, spec=spec: K.viterbi_decode_batch_bytes(spec, c))
    o = jax.block_until_ready(dec(seg))
    d = "/tmp/k9_check_prof_" + name
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    for _ in range(8):
        o = dec(seg)
    _ = np.asarray(o)
    jax.profiler.stop_trace()
    dur = collections.Counter()
    for fl in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
        for e in json.load(gzip.open(fl))["traceEvents"]:
            if e.get("ph") == "X" and "dur" in e:
                nm = e.get("name", "?")
                if "swar" in nm or "fusion" in nm:
                    dur[nm[:48]] += e["dur"]
    tot = sum(v for k_, v in dur.items() if "swar" in k_) / 8
    print(f"{name} decode-to-bytes kernels: {tot:.0f} us/call;",
          {k_: v // 8 for k_, v in dur.most_common(6)})
