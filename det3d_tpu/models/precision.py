"""Mixed-precision helper: config string -> activation dtype.

The reference's fp16 module (det3d/core/fp16/) wraps torch AMP; on TPU the
analogue is bf16 activations with fp32 parameters and fp32 BN statistics.
Modules take ``precision: str`` ("fp32" | "bf16") so configs opt in per
component; heads cast their outputs back to fp32 for loss/decode numerics.
"""

import jax.numpy as jnp

_MAP = {"fp32": jnp.float32, "float32": jnp.float32,
        "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}


def act_dtype(precision: str):
    return _MAP[str(precision).lower()]
