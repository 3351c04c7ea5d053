"""Winograd F(2,3) vs direct conv — the measurement behind the
"no Winograd" design decision (kernels/__init__.py, README).

Result on v5e (yolov5s-shaped 8x80x80x256->256 3x3 s1 bf16):
direct 0.418 ms, winograd 2.166 ms (5.2x SLOWER), rel err 6e-3 from
bf16 in the transform domain. The 2.25x multiply reduction cannot pay
for the tile-gather/transform bandwidth on an MXU that is FLOP-rich;
the reference made the opposite call correctly for 4-lane CPU SIMD.

    python scripts/winograd_experiment.py
"""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from simpleinfer_tpu.profiling import measure_device_time

G = np.array([[1,0,0],[0.5,0.5,0.5],[0.5,-0.5,0.5],[0,0,1]], np.float32)
Bt = np.array([[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]], np.float32)
At = np.array([[1,1,1,0],[0,1,-1,-1]], np.float32)

def winograd_conv(x, w):
    n,h,wd,c = x.shape
    o = w.shape[3]
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
    th, tw = h//2, wd//2
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            cols.append(lax.slice(xp, (0,i,j,0), (n, i+2*th-1, j+2*tw-1, c), (1,2,2,1)))
        rows.append(jnp.stack(cols, axis=-2))      # [n,th,tw,4,c]
    t = jnp.stack(rows, axis=-3)                   # [n,th,tw,4,4,c]
    V = jnp.einsum('ij,nabjkc,lk->nabilc', Bt, t, Bt)
    U = jnp.einsum('ij,jkco,lk->ilco', G, w.astype(jnp.float32), G)
    M = jnp.einsum('nabilc,ilco->nabilo', V.astype(jnp.bfloat16), U.astype(jnp.bfloat16))
    Y = jnp.einsum('ij,nabjko,lk->nabilo', At, M.astype(jnp.float32), At)
    Y = jnp.transpose(Y, (0,1,3,2,4,5)).reshape(n, h, wd, o)
    return Y.astype(x.dtype)

def direct(x, w):
    return lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32).astype(x.dtype)

rng = np.random.default_rng(0)
N,H,C,O = 8,80,256,256
x = jnp.asarray(rng.standard_normal((N,H,H,C)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3,3,C,O))*0.05, jnp.bfloat16)
a = np.asarray(direct(x,w).astype(jnp.float32)); b = np.asarray(winograd_conv(x,w).astype(jnp.float32))
err = np.abs(a-b).max()/max(1, np.abs(a).max())
td = measure_device_time(direct, x, w, iters=20)
tw_ = measure_device_time(winograd_conv, x, w, iters=20)
print(f'{N}x{H}x{H}x{C}->{O}: direct {td*1e3:7.3f} ms, winograd {tw_*1e3:7.3f} ms ({td/tw_:.2f}x), rel err {err:.3f}', flush=True)
