#!/bin/bash
# Final-numbers rerun harness (run when the axon TPU tunnel is healthy).
# Each stage is independent; comment out what you don't need.
# Datasets are the session-generated synthetics under /tmp (see memory
# notes round2-state): regenerate with tools/gen_polyploid.py /
# tools/gen_wheat_scale.py if /tmp was cleared.
set -x

probe() {
  timeout 600 python -c "
import time; t0=time.time()
import jax, jax.numpy as jnp
print('TPU OK:', int(jnp.arange(8).sum()), f'{time.time()-t0:.1f}s')" || exit 1
}

cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=$PWD:/root/.axon_site
probe

# 1) kernel headline (the driver also runs this)
python bench.py

# 2) 270 Mb full pipeline (core + LTR + trees + blocks + circos)
if [ -f /tmp/big/genome270.fa.gz ]; then
  cd /tmp/big && rm -rf out270e tmp270e
  time python -m subphaser_tpu -i genome270.fa.gz -c sg270.config \
    -o out270e -tmpdir tmp270e -replicates 1000 -figfmt png 2>&1 |
    tee run270e.log | grep -E '\[perf\]|Pipeline completed'
  cd - || exit 1
fi

# 3) 1.6 Gb FULL pipeline incl LTR (round-2 number: 24 min)
if [ -f /tmp/big/genome2g.fa ]; then
  cd /tmp/big && rm -rf out2ge tmp2ge
  time python -m subphaser_tpu -i genome2g.fa -c sg2g.config \
    -o out2ge -tmpdir tmp2ge -replicates 1000 -figfmt png 2>&1 |
    tee run2ge.log | grep -E '\[perf\]|Pipeline completed'
  cd - || exit 1
fi

# 4) 14 Gb wheat scale, fresh tmp (this session: 31.7 min)
if [ -f /tmp/wheat14/genome14_1_3.fa ]; then
  cd /tmp/wheat14 && rm -rf out_e tmp_e
  time python -m subphaser_tpu \
    -i genome14_1_3.fa genome14_4_5.fa genome14_6_7.fa -no_label \
    -c sg14.config -o out_e -tmpdir tmp_e -p 4 \
    -disable_ltr -disable_circos -disable_blocks 2>&1 |
    tee run14e.log | grep -E '\[perf\]|Pipeline completed'
  cd - || exit 1
fi
