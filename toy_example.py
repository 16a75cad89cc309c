"""Self-contained 2-D toy example: train a flow-matching MLP velocity field
on a Gaussian-mixture target with exact minibatch-OT coupling, then run
annotated PnP-Flow iterations on a linear inverse problem.

JAX re-design of the reference ``toy_example.py`` (toy_example.py:35-204):
the training step and the PnP iteration are single jitted programs; the OT
coupling uses the exact host assignment (ops/ot.py).

Run: ``python toy_example.py`` — writes toy_flow.png / toy_pnp.png.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from pnpflow_tpu.ops.ot import ot_pair_indices


def sample_gmm(key, n):
    """Eight-mode ring GMM in 2-D."""
    k1, k2 = jax.random.split(key)
    modes = jnp.stack(
        [
            2.5 * jnp.cos(jnp.arange(8) * 2 * jnp.pi / 8),
            2.5 * jnp.sin(jnp.arange(8) * 2 * jnp.pi / 8),
        ],
        axis=1,
    )
    idx = jax.random.randint(k1, (n,), 0, 8)
    return modes[idx] + 0.15 * jax.random.normal(k2, (n, 2))


class VelocityMLP(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, x, t):
        h = jnp.concatenate([x, t[:, None]], axis=1)
        for _ in range(3):
            h = nn.silu(nn.Dense(self.hidden)(h))
        return nn.Dense(2)(h)


def train(key, steps=2000, batch=256, lr=1e-3):
    model = VelocityMLP()
    params = model.init(key, jnp.zeros((1, 2)), jnp.zeros((1,)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x1 = sample_gmm(k1, batch)
        x0 = jax.random.normal(k2, (batch, 2))
        i0, i1 = ot_pair_indices(x0, x1, k3, method="sinkhorn")
        x0, x1 = x0[i0], x1[i1]
        t = jax.random.uniform(k4, (batch,))

        def loss_fn(p):
            xt = t[:, None] * x1 + (1 - t[:, None]) * x0
            v = model.apply(p, xt, t)
            return jnp.sum((v - (x1 - x0)) ** 2) / batch

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 500 == 0:
            print("train step", i, "loss", float(loss))
    return model, params


def pnp_flow_2d(model, params, y, A, key, steps=60, num_samples=20, lr=1.0):
    """PnP-Flow on a 2-D linear measurement y = A x (annotated trajectory)."""
    At = A.T
    sigma = 0.3

    @jax.jit
    def solve(params, y, x, key):
        def body(carry, i):
            x, key = carry
            t = i / steps
            lr_t = sigma**2 * lr * (1 - t)
            z = x - lr_t / sigma**2 * (At @ (A @ x.T - y)).T
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (num_samples,) + z.shape)
            z_tilde = t * z[None] + (1 - t) * eps
            flat = z_tilde.reshape(-1, 2)
            t_vec = jnp.full((flat.shape[0],), t)
            denoised = flat + (1 - t) * model.apply(params, flat, t_vec)
            x_new = jnp.mean(
                denoised.reshape(num_samples, -1, 2), axis=0
            )
            return (x_new, key), x_new

        (x, _), traj = jax.lax.scan(
            body, (x, key), jnp.arange(steps, dtype=jnp.float32)
        )
        return x, traj

    x0 = jnp.zeros((y.shape[1], 2))
    return solve(params, y, x0, key)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = jax.random.PRNGKey(0)
    model, params = train(key, steps=1500)

    # sample via Euler flow and plot
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (2000, 2))

    @jax.jit
    def flow(z):
        def body(x, i):
            t = jnp.full((x.shape[0],), i / 100.0)
            return x + 0.01 * model.apply(params, x, t), None

        return jax.lax.scan(body, z, jnp.arange(100, dtype=jnp.float32))[0]

    samples = np.asarray(flow(z))
    target = np.asarray(sample_gmm(k2, 2000))
    fig, ax = plt.subplots(1, 2, figsize=(10, 5))
    ax[0].scatter(*target.T, s=2, alpha=0.5)
    ax[0].set_title("target GMM")
    ax[1].scatter(*samples.T, s=2, alpha=0.5, color="tab:orange")
    ax[1].set_title("flow samples")
    fig.savefig("toy_flow.png", dpi=120)

    # inverse problem: observe only the x-coordinate (A = [1, 0])
    A = jnp.asarray([[1.0, 0.0]])
    truth = np.asarray(sample_gmm(jax.random.PRNGKey(7), 64))
    y = A @ truth.T
    x_rec, traj = pnp_flow_2d(model, params, y, A, jax.random.PRNGKey(3))
    x_rec, traj = np.asarray(x_rec), np.asarray(traj)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(*target.T, s=2, alpha=0.2, label="prior")
    ax.scatter(*truth.T, s=12, marker="x", color="k", label="truth")
    ax.scatter(*x_rec.T, s=12, color="tab:red", label="pnp_flow")
    for j in range(0, 64, 8):
        ax.plot(traj[:, j, 0], traj[:, j, 1], lw=0.5, color="tab:red",
                alpha=0.5)
    ax.legend()
    ax.set_title("PnP-Flow on y = x-coordinate")
    fig.savefig("toy_pnp.png", dpi=120)
    print("wrote toy_flow.png, toy_pnp.png")


if __name__ == "__main__":
    main()
