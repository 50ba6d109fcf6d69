#!/bin/bash
# Wait for the TPU tunnel, then run the measurement battery sequentially
# (ONE TPU process at a time). Logs to /root/repo/.battery/.
cd /root/repo
mkdir -p .battery
log() { echo "[$(date -u +%H:%M:%S)] $*" >> .battery/battery.log; }
log "battery start"
for i in $(seq 1 200); do
  if timeout 240 python -u -c "
import jax
d = jax.devices()
import jax.numpy as jnp
v = float((jnp.ones((256,256)) @ jnp.ones((256,256)))[0,0])
print('TPU_OK', d, v, flush=True)" >> .battery/battery.log 2>&1; then
    log "tunnel up at attempt $i"
    break
  fi
  log "attempt $i down"
  sleep 120
done
# battery (each solo; generous timeouts for cold compiles)
log "smoke start"
timeout 1500 python tools/tpu_smoke.py > .battery/smoke.log 2>&1
log "smoke exit $?"
log "keeprx stream geom"
timeout 1200 python tools/measure_keeprx.py stream geom > .battery/keeprx_stream_geom.json 2> .battery/keeprx_stream_geom.err
log "exit $?"
log "keeprx alias geom"
timeout 1200 python tools/measure_keeprx.py alias geom > .battery/keeprx_alias_geom.json 2> .battery/keeprx_alias_geom.err
log "exit $?"
log "keeprx stream lut"
timeout 1200 python tools/measure_keeprx.py stream lut > .battery/keeprx_stream_lut.json 2> .battery/keeprx_stream_lut.err
log "exit $?"
log "bench full"
QUPS_BENCH_SIZE=full timeout 1800 python bench.py > .battery/bench.json 2> .battery/bench.err
log "exit $?"
log "battery done"
