#!/bin/bash
# Full CPU test suite, chunked per compile-churn budget, with one retry
# per chunk on a crash (jaxlib's XLA:CPU compile path segfaults
# intermittently after ~50-100 compiles in one process — see
# .claude/skills/verify/SKILL.md).  Exit 0 iff every chunk passes.
set -u
cd "$(dirname "$0")/.."

CHUNKS=(
  "tests/test_align_jax.py tests/test_align_np.py tests/test_align_pallas.py tests/test_anchored.py tests/test_cli.py"
  "tests/test_e2e.py"
  "tests/test_fuzz_align.py"
  "tests/test_dist.py -k 'not padded_exchange_path and not codec_roundtrip'"
  "tests/test_dist.py -k 'padded_exchange_path or codec_roundtrip'"
  "tests/test_io.py tests/test_mapper.py tests/test_native.py tests/test_parallel.py tests/test_profiling.py tests/test_seed_chain.py tests/test_seeding_chain_jax.py tests/test_sv_stages.py"
)

fail=0
for chunk in "${CHUNKS[@]}"; do
  for attempt in 1 2; do
    echo "=== pytest $chunk (attempt $attempt)"
    eval "timeout 2400 python -m pytest $chunk -q -m \"slow or not slow\""
    rc=$?
    if [ $rc -eq 0 ]; then
      break
    fi
    echo "=== chunk failed rc=$rc"
    if [ $attempt -eq 2 ] || { [ $rc -ne 139 ] && [ $rc -ne 134 ] && [ $rc -ne 124 ]; }; then
      fail=1
      break
    fi
    echo "=== crash/timeout (rc=$rc): retrying chunk once"
  done
done
exit $fail
