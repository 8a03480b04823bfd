#!/usr/bin/env bash
# XLA compiler-flag sweep at the north-star shape (8-hyp adam_quick
# gradient refinement, flagship family). Each config compiles fresh (the
# flags change the executable fingerprint, so the persistent cache keys
# them apart automatically) and appends its bench record to the JSON file;
# the flag string is recorded with each row.
#
# Candidate flags and why:
#   * licm_size_inflation_ratio — while-loop invariant code motion budget:
#     the refinement body re-stages loop-invariant operands each iteration
#     (the round-3 trace's "layout copies"); letting LICM hoist larger
#     instructions may remove them.
#   * scoped_vmem_limit_kib — larger scoped VMEM lets the fusion emitter
#     build deeper fusions (the per-iter profile is ~16% VPU reduce
#     fusions).
#   * latency-hiding scheduler — overlap DMA with compute in the loop body.
#
# Usage: bash tools/xla_flag_sweep.sh [out.json]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/xla_flag_sweep.json}

run() {
    local tag=$1; shift
    local flags=${1-}; shift || true
    echo "=== $tag XLA_FLAGS='$flags'" >&2
    XLA_FLAGS="$flags" python bench.py --mode gradient --json-out "$OUT" \
        --skip-flops-probe "$@" \
        && python - "$OUT" "$tag" "$flags" <<'EOF'
import json, sys
path, tag, flags = sys.argv[1:4]
rows = [json.loads(l) for l in open(path) if l.strip()]
rows[-1]["xla_flags"] = flags
rows[-1]["sweep_tag"] = tag
open(path, "w").write("".join(json.dumps(r) + "\n" for r in rows))
print(f"{tag}: {rows[-1]['value']:.0f} {rows[-1]['unit']}")
EOF
}

run baseline ""
run licm4 "--xla_tpu_licm_size_inflation_ratio=4"
run vmem64 "--xla_tpu_scoped_vmem_limit_kib=65536"
run vmem128 "--xla_tpu_scoped_vmem_limit_kib=131072"
run lhs_off "--xla_latency_hiding_scheduler_rerun=0"
run combo "--xla_tpu_licm_size_inflation_ratio=4 --xla_tpu_scoped_vmem_limit_kib=65536"
run unroll2 "" --refine-unroll 2
run unroll2_vmem64 "--xla_tpu_scoped_vmem_limit_kib=65536" --refine-unroll 2
