#!/bin/bash
# Strong-scaling measurement with the round-4 contamination removed
# (VERDICT r4 item 5): the 1-device baseline previously multi-threaded one
# virtual device's work across BOTH host cores, deflating the 2-device
# efficiency to 0.679. Here each configuration gets exactly one physical
# core per virtual device via taskset, so the comparison is
# 1 device x 1 core vs 2 devices x 2 cores — the honest strong-scaling
# ratio of the SPMD program (sharding + psum overhead only).
#
# Writes results/scaling_r5.json (merged from the two runs).
set -e
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

B=${B:-256}
TICKS=${TICKS:-10}

XLA_FLAGS="--xla_force_host_platform_device_count=1" taskset -c 0 \
  python scripts/scaling_report.py --devices 1 --batch $B --ticks $TICKS \
  --strong --out /tmp/scaling_r5_d1.json
XLA_FLAGS="--xla_force_host_platform_device_count=2" taskset -c 0,1 \
  python scripts/scaling_report.py --devices 2 --batch $B --ticks $TICKS \
  --strong --out /tmp/scaling_r5_d2.json

python - <<'EOF'
import json
d1 = json.load(open("/tmp/scaling_r5_d1.json"))
d2 = json.load(open("/tmp/scaling_r5_d2.json"))
r1 = d1["rows"][0]; r2 = d2["rows"][0]
eff = (r2["solves_per_s"] / r1["solves_per_s"]) / 2.0
out = {
  "mode": "strong-scaling, 1 physical core per virtual device (taskset)",
  "platform": "cpu-virtual",
  "batch_total": r1["batch"],
  "rows": [
    {"devices": 1, "cores": 1, "solves_per_s": r1["solves_per_s"]},
    {"devices": 2, "cores": 2, "solves_per_s": r2["solves_per_s"]},
  ],
  "strong_scaling_efficiency_2dev": round(eff, 3),
  "meets_0p70_target": bool(eff >= 0.70),
  "note": "round-4's 0.679 measured 2 devices against a 1-device baseline "
          "that already used both host cores (contamination documented in "
          "results/scaling_r4_strong.json); pinning one core per device "
          "removes it. ICI scaling on a real slice remains future "
          "hardware-dependent work.",
}
json.dump(out, open("results/scaling_r5.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
