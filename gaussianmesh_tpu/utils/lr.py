"""Learning-rate schedules.

`expon_lr` reproduces the reference log-lerp schedule with optional delay
(/root/reference/utils/general_utils.py:29-62), as a pure function of the
step so it composes with optax and jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    if lr_init == lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    # step<=0 or disabled -> 0.0 in the reference; keep that behavior.
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)
