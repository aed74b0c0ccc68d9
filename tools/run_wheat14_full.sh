#!/bin/bash
# Full-DEFAULT 14 Gb wheat-scale run (VERDICT r4 #1): core + mapping +
# enrichment + LTR detect/classify(E-value + SSV)/trees + blocks + circos.
# Dataset: tools/gen_wheat_scale.py /tmp/wheat14 7 667 --sets ... --hmm
# (two range files; -no_label treats them as one genome).
set -x
cd /tmp/wheat14 || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 600 python -c "
import time; t0=time.time()
import jax, jax.numpy as jnp
print('TPU OK:', int(jnp.arange(8).sum()), f'{time.time()-t0:.1f}s')" || exit 1
exec timeout "${WHEAT_TIMEOUT:-14400}" python -u -m subphaser_tpu \
  -i genome14_1_4.fa genome14_5_7.fa -no_label \
  -c sg14.config -o out -tmpdir tmp \
  -min_freq 200 -hmm_db wheat_rexdb.hmm -figfmt png
