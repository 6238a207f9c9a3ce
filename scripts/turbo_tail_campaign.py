"""Converge the turbo acceptance TAIL points (VERDICT r4 next #4).

The round-4 acceptance artifact carried `passed: false` at
(L=1024, 1.0 dB) and (L=6144, 0.7 dB) — honestly excluded from the
gate, but the deep-tail agreement between the two implementations was
*unknown*, not confirmed.  The reference converges statistics at every
gated point (berTestK7.c:95-100); this campaign does the same for the
tail: >= 1000 block-error events per point on BOTH sides (C++ oracle
and the TPU chain), so the relative sampling error per side is
~ sqrt(1/1000) ~ 3% and a 15% gate is meaningful.

Usage:
  python scripts/turbo_tail_campaign.py --oracle [--shard I --nshards N]
      CPU-only: runs the C++ oracle campaign for both tail points,
      writing /tmp/turbo_tail_oracle_<L>_<shard>.json per shard.
      Shards use distinct mt19937_64 seeds (9865 + shard) and are
      independent samples; sum errors across shards.
  python scripts/turbo_tail_campaign.py --collect
      Sums the oracle shard files into pinned constants.
  python scripts/turbo_tail_campaign.py --measure
      TPU: runs the measured-chain campaign at matching block counts
      via harness.run_bler_curve_turbo (kernel path), writing
      /tmp/turbo_tail_measured.json.
"""

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

#: (L, ebn0_db, total blocks per side).  Block counts sized for
#: >= 1000 block-error events at the round-4 BLER estimates
#: (4.25e-3 at L=1024 -> 256k blocks ~ 1090 events; 7.667e-3 at
#: L=6144 -> 160k blocks ~ 1230 events).
POINTS = [
    (1024, 1.0, 262144),
    (6144, 0.7, 163840),
]

BASE_SEED = 9865   # the repo's campaign seed; shard s uses BASE_SEED + s


def run_oracle(shard: int, nshards: int) -> None:
    from convolutionalencdec_tpu.native import turbo_oracle_ber_point
    from convolutionalencdec_tpu.ops.lte import lte_qpp
    from convolutionalencdec_tpu.ops.turbo import RscSpec
    rsc = RscSpec()
    for L, ebn0, total in POINTS:
        n = total // nshards
        perm = lte_qpp(L)
        ber, bler = turbo_oracle_ber_point(
            rsc, L, perm, ebn0, n_blocks=n, seed=BASE_SEED + shard)
        out = {"L": L, "ebn0_db": ebn0, "blocks": n, "shard": shard,
               "bit_errors": int(round(ber * n * L)),
               "block_errors": int(round(bler * n))}
        path = f"/tmp/turbo_tail_oracle_{L}_{shard}.json"
        with open(path, "w") as f:
            json.dump(out, f)
        print(json.dumps(out), flush=True)


def collect() -> None:
    for L, ebn0, total in POINTS:
        files = sorted(glob.glob(f"/tmp/turbo_tail_oracle_{L}_*.json"))
        be = blk = n = 0
        for p in files:
            with open(p) as f:
                d = json.load(f)
            be += d["bit_errors"]
            blk += d["block_errors"]
            n += d["blocks"]
        if not n:
            print(f"L={L}: no shards yet")
            continue
        print(json.dumps({
            "L": L, "ebn0_db": ebn0, "blocks": n,
            "block_errors": blk, "bit_errors": be,
            "ber": be / (n * L), "bler": blk / n,
            "rel_sigma_bler": (blk ** -0.5) if blk else None}))


def measure() -> None:
    import jax
    from convolutionalencdec_tpu.harness import run_bler_curve_turbo
    assert jax.default_backend() == "tpu", "run --measure on the chip"
    results = []
    for L, ebn0, total in POINTS:
        pt = run_bler_curve_turbo(
            ebn0_points=[ebn0], L=L, n_blocks=total,
            batch=2048 if L <= 2048 else 512, n_iters=6,
            seed=11, use_kernel=True, verbose=False)[0]
        pt["L"] = L
        results.append(pt)
        print(json.dumps(pt), flush=True)
    with open("/tmp/turbo_tail_measured.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        shard = int(sys.argv[sys.argv.index("--shard") + 1]) \
            if "--shard" in sys.argv else 0
        nshards = int(sys.argv[sys.argv.index("--nshards") + 1]) \
            if "--nshards" in sys.argv else 1
        run_oracle(shard, nshards)
    elif "--collect" in sys.argv:
        collect()
    elif "--measure" in sys.argv:
        measure()
    else:
        print(__doc__)
