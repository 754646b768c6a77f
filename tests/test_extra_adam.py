"""ExtraAdam parity vs a torch twin of the reference extragradient Adam
(reference optim.py:137-291): the even-step extrapolation / odd-step update
alternation must produce identical parameter trajectories."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from climategan_tpu.optim import extra_adam_step, init_extra_adam


class TorchExtraAdam:
    """Minimal torch twin (reference semantics: update() computes an Adam
    delta; extrapolation() saves params then applies it; step() applies a
    freshly-computed delta to the saved params)."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-8):
        self.params = [p.clone() for p in params]
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.state = [
            {"step": 0, "m": torch.zeros_like(p), "v": torch.zeros_like(p)}
            for p in self.params
        ]
        self.saved = None

    def _update(self, i, grad):
        st = self.state[i]
        st["step"] += 1
        st["m"].mul_(self.b1).add_(grad, alpha=1 - self.b1)
        st["v"].mul_(self.b2).addcmul_(grad, grad, value=1 - self.b2)
        bc1 = 1 - self.b1 ** st["step"]
        bc2 = 1 - self.b2 ** st["step"]
        step_size = self.lr * (bc2 ** 0.5) / bc1
        return -step_size * st["m"] / (st["v"].sqrt() + self.eps)

    def extrapolation(self, grads):
        self.saved = [p.clone() for p in self.params]
        for i, g in enumerate(grads):
            self.params[i] = self.params[i] + self._update(i, g)

    def step(self, grads):
        for i, g in enumerate(grads):
            self.params[i] = self.saved[i] + self._update(i, g)
        self.saved = None


def test_extra_adam_matches_torch_trajectory():
    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 3).astype(np.float32)
    target = rng.randn(5, 3).astype(np.float32)
    lr, b1 = 1e-2, 0.9

    # torch side
    tp = TorchExtraAdam([torch.from_numpy(p0.copy())], lr, betas=(b1, 0.999))

    # jax side
    params = {"w": jnp.asarray(p0)}
    state = init_extra_adam(params)

    def grad_of(p):
        return p - target  # grad of 0.5||p - target||^2

    for step in range(6):
        # torch: grads computed at *current* params
        g_t = torch.from_numpy(np.asarray(grad_of(
            np.asarray(tp.params[0])))).clone()
        if step % 2 == 0:
            tp.extrapolation([g_t])
        else:
            tp.step([g_t])

        g_j = {"w": jnp.asarray(grad_of(np.asarray(params["w"])))}
        params, state = extra_adam_step(
            g_j, state, params, lr=lr,
            extrapolate=jnp.asarray(step % 2 == 0), b1=b1,
        )

        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.params[0].numpy(),
            rtol=1e-5, atol=1e-6,
            err_msg=f"diverged at step {step}",
        )
