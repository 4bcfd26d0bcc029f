import sys, ctypes, time
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp, numpy as np
import egm_unet_tpu
def rss():
    for ln in open('/proc/self/status'):
        if ln.startswith('VmRSS'): return int(ln.split()[1])//1024
rng = np.random.default_rng(0)
@jax.jit
def step(x): return jnp.tanh(x*1.0003).sum()
side = 1448
float(step(rng.standard_normal((side,side), dtype=np.float32)))
r0 = rss()
for i in range(100):
    float(step(rng.standard_normal((side,side), dtype=np.float32)))
r1 = rss()
libc = ctypes.CDLL("libc.so.6")
freed = libc.malloc_trim(0)
time.sleep(1)
r2 = rss()
print(f"before={r0} after100={r1} (+{r1-r0}) malloc_trim rc={freed} after_trim={r2} (freed {r1-r2})", flush=True)
