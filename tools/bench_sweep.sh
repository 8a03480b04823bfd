#!/bin/bash
# Run every bench.py mode back-to-back on the real chip and append the
# per-mode accounting records to one per-round JSON artifact (VERDICT r2
# item 1d: "commit all bench modes to a per-round JSON artifact").
# Usage: tools/bench_sweep.sh artifacts/bench_r3.json
set -u
OUT="${1:-artifacts/bench_r3.json}"
rm -f "$OUT"
cd "$(dirname "$0")/.."

run() {
    echo "=== bench.py $* ===" >&2
    timeout 3000 python bench.py --json-out "$OUT" "$@" || \
        echo "FAILED: bench.py $*" >&2
}

run                              # gradient, 8 hyp (north star)
run --refine-unroll 2            # masked-unroll A/B (bit-exact)
run --refine-unroll 4
run --hypotheses 32              # saturated refinement
run --objects 4                  # multi-object batched refinement
run --fp32                       # precision A/B
run --mode cem                   # coarse search (honest render count)
run --mode full                  # end-to-end s/object (cold+warm recorded)
run --mode full --noisy-masks    # MOPED-conditions variant
run --mode train                 # batch-1 train step
run --mode train --batch 8 --batch-groups 2 --remat   # published batch
echo "=== sweep done -> $OUT ===" >&2
