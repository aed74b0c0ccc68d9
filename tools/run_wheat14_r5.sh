#!/bin/bash
# Round-5 wheat 14 Gb FULL-default launcher: resumable + retrying.
# The run resumes from /tmp/wheat14/tmp checkpoints (packed genome,
# spectra, map bins, per-chromosome .scn detection parts, classification
# chunk streams, per-pair PAFs), so a relay death mid-phase costs only the
# unfinished unit of work. Retries probe the backend first and back off.
cd /tmp/wheat14 || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=wheat14_r5.log
for attempt in 1 2 3 4 5 6; do
  echo "=== attempt $attempt start $(date +%F\ %T) ===" >> "$LOG"
  if ! timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "=== backend probe failed; sleeping 180s ===" >> "$LOG"
    sleep 180
    continue
  fi
  timeout "${WHEAT_TIMEOUT:-21600}" python -u -m subphaser_tpu \
    -i genome14_1_4.fa genome14_5_7.fa -no_label \
    -c sg14.config -o out -tmpdir tmp \
    -min_freq 200 -hmm_db wheat_rexdb.hmm -figfmt png >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $attempt rc=$rc $(date +%F\ %T) ===" >> "$LOG"
  [ "$rc" -eq 0 ] && exit 0
  sleep 60
done
exit 1
