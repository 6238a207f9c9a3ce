"""Round-5 turbo acceptance artifact: all four gated points with
CONVERGED statistics (>= ~1000 block-error events each side), closing
VERDICT r4's "tail rows unresolved" item.

Waterfall points run at 16k blocks (thousands of events); tail points
at the scripts/turbo_tail_campaign.py scale (262k / 164k blocks,
matching the oracle campaigns that re-pinned TURBO_EXPECTED).  Every
row must come out `passed: true` — there are no excluded rows left.

Writes ACCEPTANCE_TURBO_r05.json (supersedes ACCEPTANCE_TURBO_16K_r04,
whose two tail rows were honest sampling noise at 50-90 events).
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from convolutionalencdec_tpu.harness.curve import run_turbo_acceptance

POINTS = (
    (1024, 0.5, 16384),
    (1024, 1.0, 262144),
    (6144, 0.4, 16384),
    (6144, 0.7, 163840),
)

res = run_turbo_acceptance(points=POINTS, batch=2048, verbose=True)
with open("/root/repo/ACCEPTANCE_TURBO_r05.json", "w") as f:
    json.dump(res, f, indent=1)
npass = sum(r["passed"] for r in res)
print(f"{npass}/{len(res)} points passed")
sys.exit(0 if npass == len(res) else 1)
