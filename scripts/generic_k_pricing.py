"""Price fused binary-halving kernels beyond k=2/NS=64 (VERDICT r4
next #6, ROADMAP item 4).

Measures the EXISTING generic any-k kernel (per-step (u,s)->natural
relayout) at the three relevant configurations on chip:

  k=2 / NS=64   — the calibration point where the fused alternative
                  exists (kernels/acs_k2.py, measured 2.65 Gbit/s =
                  1.78x the generic kernel);
  k=2 / NS=256  — would need a NEW 4-phase piece geometry (8 state
                  bits); the K=9 k=1 precedent says one-vreg tiles +
                  register pressure shave ~15% off per-state
                  efficiency at NS=256;
  k=3 / NS=64   — would need a 2-phase 3-bit-digit geometry; rate-3/n
                  codes with K=3 are practically unused (punctured
                  rate-1/n dominates deployments).

Closing arithmetic: the fused decomposition's ceiling is the
calibrated 1.78x (same relayout fraction removed), derated to ~1.5x
at NS=256 by the measured K=9 register-pressure precedent.  Against
that, each geometry is a new kernel family (piece specs + MXU weight
layout + 3-plane traceback) for codes without deployed users — the
generic kernel stays the bit-exact covering path.  Numbers recorded
in ROADMAP item 4 / ROOFLINE.
"""
import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from convolutionalencdec_tpu.params import CodeSpec  # noqa: E402
from convolutionalencdec_tpu.kernels.acs_pallas import (  # noqa: E402
    viterbi_decode_batch_generic)
from convolutionalencdec_tpu.kernels.acs_k2 import (  # noqa: E402
    viterbi_decode_batch_k2)

CONFIGS = [
    ("k2_NS64", CodeSpec(K=4, k=2, g=(0o64, 0o52, 0o71))),
    ("k2_NS256", CodeSpec(K=5, k=2, g=(0o1633, 0o1255, 0o1117))),
    ("k3_NS64", CodeSpec(K=3, k=3, g=(0o715, 0o663, 0o557))),
]

B, T = 2048, 512


def main():
    rng = np.random.default_rng(3)
    fns = {}
    bufs = {}
    for name, spec in CONFIGS:
        segs = rng.integers(0, 1 << spec.n, (B, T), np.uint8)
        bufs[name] = [jax.device_put(jnp.asarray(np.roll(segs, r, axis=0)))
                      for r in range(8)]
        fns[name] = (lambda s: (lambda x: viterbi_decode_batch_generic(s, x)))(spec)
    # fused comparison at the calibration point
    k2spec = CONFIGS[0][1]
    fns["k2_NS64_fused"] = lambda x: viterbi_decode_batch_k2(k2spec, x)
    bufs["k2_NS64_fused"] = bufs["k2_NS64"]

    outs = {}
    for name, f in fns.items():
        outs[name] = np.asarray(f(bufs[name][0]))
    np.testing.assert_array_equal(outs["k2_NS64"], outs["k2_NS64_fused"])
    print("fused == generic at k2/NS64 (bit-exact)", flush=True)

    shutil.rmtree("/tmp/gk_prof", ignore_errors=True)
    jax.profiler.start_trace("/tmp/gk_prof")
    marks = {}
    for name, f in fns.items():
        for i in range(8):
            out = f(bufs[name][i % 8])
        out.block_until_ready()
    jax.profiler.stop_trace()
    tf = sorted(glob.glob("/tmp/gk_prof/**/*.trace.json.gz",
                          recursive=True))[-1]
    ev = json.load(gzip.open(tf))["traceEvents"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                e.get("name", "").startswith("jit_"):
            k = e["name"].split("(")[0]
            dur[k] += e["dur"]
            cnt[k] += 1
    print("--- device truth ---")
    for k, v in dur.most_common(10):
        per = v / max(cnt[k], 1)
        print(f"  {k}: {per:.0f} us/call x{cnt[k]}")
    # jit names don't distinguish configs (same fn name per config via
    # closures) — rerun per config with separate traces for attribution
    for name, f in fns.items():
        spec = dict(CONFIGS).get(name.replace("_fused", ""),
                                 dict(CONFIGS)["k2_NS64"])
        shutil.rmtree("/tmp/gk_prof1", ignore_errors=True)
        jax.profiler.start_trace("/tmp/gk_prof1")
        for i in range(8):
            out = f(bufs[name][i % 8])
        out.block_until_ready()
        jax.profiler.stop_trace()
        tf = sorted(glob.glob("/tmp/gk_prof1/**/*.trace.json.gz",
                              recursive=True))[-1]
        ev = json.load(gzip.open(tf))["traceEvents"]
        tot = collections.Counter()
        c2 = collections.Counter()
        for e in ev:
            if e.get("ph") == "X" and "dur" in e and \
                    e.get("name", "").startswith("jit_"):
                k = e["name"].split("(")[0]
                tot[k] += e["dur"]
                c2[k] += 1
        us = sum(v / max(c2[k], 1) for k, v in tot.items())
        bits = B * (T - spec.S) * spec.k
        print(f"  {name}: {us:.0f} us/call total -> "
              f"{bits / us / 1000:.2f} Gbit/s", flush=True)


if __name__ == "__main__":
    main()
