#!/bin/bash
# Regenerate every committed exp_results/ artifact from its recorded
# protocol script.  All evidence is CPU-pinned (deterministic seeds); the
# round-2 lesson is that evidence must be COMMITTED, not just on disk —
# exp_results/ was gitignored and lost between sessions.
#
# Usage: bash scripts/regen_evidence.sh <stream>
#   stream a: MFBO head-to-heads + GAR field sweeps + figures + grid sweeps
#   stream b: GAR/CIGAR reference head-to-head + zoo robustness
#   stream c: (round 4) CAR head-to-head (3 protocols) + CAR/GAR/CIGAR zoo
#             robustness + CAR/MFBO figures
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_results/logs exp_results/figures
export JAX_PLATFORMS=cpu

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout 14000 "$@" > "exp_results/logs/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc ($(date -u +%H:%M:%S))"
}

case "${1:-a}" in
a)
  run mfbo_headtohead python scripts/mfbo_headtohead.py
  run mfbo_continuous python scripts/mfbo_continuous_headtohead.py
  for variant in aligned non-aligned non-subset; do
    run "gar_field_$variant" python -m fidelityfusion_tpu.experiments.sweep \
      --protocol gar-field --variant "$variant" --max-iter 100 \
      --outdir exp_results/gar_field
  done
  run figures python - <<'EOF'
from fidelityfusion_tpu.experiments.plots import plot_metric_vs_nhigh
for variant in ("aligned", "non-aligned", "non-subset"):
    plot_metric_vs_nhigh(
        "exp_results/gar_field", f"poisson_{variant}",
        save_to=f"exp_results/figures/gar_field_{variant}_rmse.png")
    print("wrote", variant)
EOF
  run grid_sweep python -m fidelityfusion_tpu.experiments.sweep \
    --methods AR ResGP NAR --datasets tl112 forrester12 \
    --seeds 0 1 2 3 4 --outdir exp_results/grid
  ;;
b)
  run ref_gar_headtohead python scripts/ref_gar_headtohead.py
  run zoo_robustness python scripts/zoo_robustness.py
  ;;
c)
  run ref_car_headtohead python scripts/ref_car_headtohead.py
  MODELS=CAR,GAR,CIGAR OUT=cells_car_gar_cigar.csv \
    run zoo_robustness_cgc python scripts/zoo_robustness.py
  run zoo_joint python scripts/zoo_joint_robustness.py
  # round 5: tensor-model joint rows + the UCB beta-floor A/B
  MODELS=GAR,CIGAR run zoo_joint_tensor python scripts/zoo_joint_robustness.py
  BETA_FLOOR=0.25 ACQS=UCB run mfbo_betafloor python scripts/mfbo_headtohead.py
  run car_summary python scripts/summarize_car.py
  run mfbo_figures python scripts/plot_mfbo.py
  ;;
esac
echo "stream ${1:-a} complete"
