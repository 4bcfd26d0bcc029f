import gc, time, sys
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp, numpy as np
import egm_unet_tpu
def rss():
    for ln in open('/proc/self/status'):
        if ln.startswith('VmRSS'): return int(ln.split()[1])//1024
rng = np.random.default_rng(0)
@jax.jit
def step(x): return jnp.tanh(x*1.0003).sum()
side = 1448  # ~8MB f32
x0 = rng.standard_normal((side,side), dtype=np.float32)
float(step(x0))
print('start', rss(), flush=True)
for i in range(100):
    float(step(rng.standard_normal((side,side), dtype=np.float32)))
print('after 100 np-arg transfers', rss(), flush=True)
# variant: pre-device_put then delete
for i in range(100):
    xa = jax.device_put(rng.standard_normal((side,side), dtype=np.float32))
    float(step(xa)); xa.delete()
print('after 100 device_put+delete', rss(), flush=True)
jax.clear_caches(); gc.collect(); time.sleep(2)
print('after clear_caches', rss(), flush=True)
# does more work reclaim it?
for i in range(20): float(step(x0))
time.sleep(3)
print('after reuse + sleep', rss(), flush=True)
