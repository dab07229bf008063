#!/bin/bash
# Does any XLA compiler knob move the single-chip headline?
# Runs bench.py under candidate XLA_FLAGS sets, sequentially (one TPU).
cd /root/repo
OUT=scripts/tpu_xla_flags_probe.out
: > $OUT
run() {
  echo "=== $1" >> $OUT
  XLA_FLAGS="$2" BENCH_ITERS=10 timeout 580 python bench.py >> $OUT 2>/tmp/xla_probe_err.log \
    || echo "FAILED (see /tmp/xla_probe_err.log tail): $(tail -1 /tmp/xla_probe_err.log)" >> $OUT
}
run baseline ""
run latency_hiding "--xla_tpu_enable_latency_hiding_scheduler=true"
run vmem_32m "--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem_64m "--xla_tpu_scoped_vmem_limit_kib=65536"
run flash_defaults "--xla_tpu_enable_flash_attention=true"
echo done >> $OUT
