#!/bin/bash
# Hardware parity preflight (VERDICT r4 item 6): run the TPU smoke tests
# (pallas-vs-jax kernel parity on the real chip) and stamp the current
# kernel-file hash on success. bench.py and tools/run_quality.sh consult
# the stamp; a kernel edit invalidates it until this passes again.
#
# The TPU is single-tenant: this will block (and eventually fail) if a
# training run holds the device. Serialize.
set -eu
cd "$(dirname "$0")/.."

echo "preflight: kernel hash $(python tools/preflight.py hash | head -c 16)…"
echo "preflight: running TPU smoke tests (hardware parity)…"
GSTK_TEST_TPU=1 timeout 1800 python -m pytest tests/test_tpu_smoke.py -q

python tools/preflight.py stamp --source tpu_smoke
echo "preflight: OK"
