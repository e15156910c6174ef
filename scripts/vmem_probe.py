"""
Empirically determine usable VMEM on the attached TPU: compile+run a
trivial Pallas kernel with an N-MiB VMEM scratch, bisecting up from
8 MiB. The fused FFT kernel design needs to know whether ~16 MiB
(guide figure) or ~128 MiB (v4/v5 physical) is actually available.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_mib(mib: int) -> bool:
    rows = mib * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :] * 2.0
        o_ref[:] = x_ref[:] + scratch[0, 0]

    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=mib * 1024 * 1024 + (1 << 20),
            ),
        )(x)
        np.asarray(out)
        return True
    except Exception as e:
        print(f"  {mib} MiB failed: {str(e)[:160]}", flush=True)
        return False


def main():
    sizes = [8, 16, 24, 32, 48, 64, 96, 110, 120]
    ok = 0
    for mib in sizes:
        if try_mib(mib):
            ok = mib
            print(f"  {mib} MiB OK", flush=True)
        else:
            break
    print(f"max_ok_mib={ok}")


if __name__ == "__main__":
    main()
