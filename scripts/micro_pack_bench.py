import time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from climategan_tpu.ops.s2d import s2d_pack_kernel, _phase_outputs

def old_pair(x, kg, kb):
    k4 = jnp.concatenate([s2d_pack_kernel(kg), s2d_pack_kernel(kb)], -1).astype(x.dtype)
    return jax.lax.conv_general_dilated(x, k4, (2,2), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=x.dtype)

def new_pair(x, kg, kb):
    k = jnp.concatenate([kg, kb], -1)
    ph = _phase_outputs(x, k)
    o = kg.shape[-1]
    g = jnp.concatenate([p[..., :o] for p in ph], -1)
    b = jnp.concatenate([p[..., o:] for p in ph], -1)
    return g + b  # force both outputs

shapes = [  # (H, C, O_each, label)
    (640, 128, 40, "up4 dual branch / O_pair=80"),
    (640, 128, 20, "final_spade norms / O_pair=40"),
    (320, 128, 80, "up3 dual branch / O_pair=160"),
]
B = 32
for H, C, O, label in shapes:
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, H, C), jnp.bfloat16)
    kg = jnp.asarray(rs.randn(3,3,C,O), jnp.bfloat16)
    kb = jnp.asarray(rs.randn(3,3,C,O), jnp.bfloat16)
    for name, fn in [("old", old_pair), ("new", new_pair)]:
        f = jax.jit(fn)
        r = f(x, kg, kb); np.asarray(r[0,0,0])  # compile+sync
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x, kg, kb)
        np.asarray(r[0,0,0])
        dt = (time.perf_counter()-t0)/n*1000
        print(f"{label:36s} {name}: {dt:7.2f} ms")
