"""Dirichlet-simplex demos — jax-native port of the reference notebooks
``demo/dirichlet/Diri_PnP.ipynb`` and ``demo/dirichlet/Diri_DFlow.ipynb``.

The reference restores 28x28 MNIST digits living on the 784-simplex with a
flow prior whose LATENT is Dirichlet(1, ..., 1) instead of Gaussian:

  * Diri_PnP: the PnP-Flow loop with the MC denoiser drawing Dirichlet
    samples (Diri_PnP.ipynb cell 2: z2 ~ Dir, z~ = t z + (1-t) z2,
    D = z~ + (1-t) v, lr_t = (1-t)), for super-resolution x2 (zero-fill
    upsample adjoint), denoising, and top-half inpainting.
  * Diri_DFlow: d_flow latent optimization with LBFGS(strong Wolfe) and an
    added simplex penalty  w * (sum(z) - 1)^2  (Diri_DFlow.ipynb cells
    2-4), init z = sqrt(0.1) inverse_flow(x) + sqrt(0.9) Dir sample.

The published MNIST-Dirichlet checkpoint and the MNIST files are not
reachable offline, so the demo first trains the same small U-Net
(input 28², ch 32, mult (1,2), 2 res blocks, attn@16 — Diri_PnP.ipynb
cell 1) as a Dirichlet-latent flow on the available data (MNIST when
present under ./data, synthetic digit-like blobs otherwise) and then runs
all six experiments, saving 4x4 grids like the notebooks.

Run: python demo/dirichlet.py         (CPU is fine; a few minutes)
Env: DIRI_STEPS / DIRI_TRAIN_ITERS / DIRI_DFLOW_ITERS shrink it for tests.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DIM = 28
B = 16
D = DIM * DIM

STEPS = int(os.environ.get("DIRI_STEPS", 300))          # notebook: 300
NUM_SAMPLES = int(os.environ.get("DIRI_MC", 5))         # notebook: 5
TRAIN_ITERS = int(os.environ.get("DIRI_TRAIN_ITERS", 300))
DFLOW_STEPS = int(os.environ.get("DIRI_DFLOW_ITERS", 20))  # notebook: 20
OUT_DIR = os.environ.get("DIRI_OUT", "results/dirichlet")


def dirichlet_sample(key, n):
    """Dir(1,...,1) over the 784-simplex, shaped (n, 28, 28, 1)."""
    s = jax.random.dirichlet(key, jnp.ones((D,)), (n,))
    return s.reshape(n, DIM, DIM, 1)


def downsample(x, sf=2):
    """Strided decimation (notebook ``downsample``)."""
    return x[:, ::sf, ::sf, :]


def upsample(x, sf=2):
    """Zero-fill s-fold upsampler — the decimation adjoint (notebook
    ``upsample``)."""
    b, h, w, c = x.shape
    z = jnp.zeros((b, h, sf, w, sf, c), x.dtype)
    z = z.at[:, :, 0, :, 0, :].set(x)
    return z.reshape(b, h * sf, w * sf, c)


def load_simplex_batch(key):
    """A batch of digits normalized onto the simplex (notebook cell 2)."""
    from pnpflow_tpu.data.datasets import DataLoaders

    name = "mnist" if os.path.isdir("./data/mnist") else "synthetic"
    loaders = DataLoaders(name, B, B, dim_image=DIM, num_channels=1,
                          root="./data").load_data()
    x, _ = next(iter(loaders["test"]))
    x = jnp.asarray(np.asarray(x, np.float32)[:B])
    x = (x + 1.0) / 2.0  # [-1,1] -> [0,1] intensities
    return x / jnp.sum(x, axis=(1, 2, 3), keepdims=True)


def train_dirichlet_flow(key):
    """FM training with a Dirichlet source: x_t = t x1 + (1-t) x0,
    target v = x1 - x0, x0 ~ Dir (independent coupling)."""
    import optax

    from pnpflow_tpu.models.unet import VelocityUNet

    model = VelocityUNet(input_channels=1, input_height=DIM, ch=32,
                         ch_mult=(1, 2), num_res_blocks=2,
                         attn_resolutions=(16,))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, DIM, DIM, 1)), jnp.zeros((1,)))
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    def loss_fn(p, x0, x1, t):
        xt = t[:, None, None, None] * x1 + (1 - t[:, None, None, None]) * x0
        v = model.apply(p, xt, t)
        return jnp.sum((v - (x1 - x0)) ** 2) / x1.shape[0]

    @jax.jit
    def step(p, opt_state, x1, key):
        k0, kt = jax.random.split(key)
        x0 = dirichlet_sample(k0, x1.shape[0])
        t = jax.random.uniform(kt, (x1.shape[0],))
        loss, g = jax.value_and_grad(loss_fn)(p, x0, x1, t)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    from pnpflow_tpu.data.datasets import DataLoaders

    name = "mnist" if os.path.isdir("./data/mnist") else "synthetic"
    loaders = DataLoaders(name, 64, 64, dim_image=DIM, num_channels=1,
                          root="./data").load_data()
    it = 0
    loss = float("nan")
    while it < TRAIN_ITERS:
        for x, _ in loaders["train"]:
            if it >= TRAIN_ITERS:
                break
            x = jnp.asarray(np.asarray(x, np.float32))
            x = (x + 1.0) / 2.0
            x = x / jnp.sum(x, axis=(1, 2, 3), keepdims=True)
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, sub)
            it += 1
    print("  trained {} iters, final FM loss {:.3e}".format(it, float(loss)))
    return model, params


# ---------------------------------------------------------------------------
# Diri_PnP: PnP-Flow with Dirichlet MC draws (Diri_PnP.ipynb cells 2-4)


def pnp_dirichlet(model, params, y, H, H_adj, key):
    @jax.jit
    def solve(params, y, x, key):
        def step(x, i):
            t = i / STEPS
            grad = H_adj(H(x) - y)
            z = x - (1.0 - t) * grad
            k = jax.random.fold_in(key, i)
            acc = jnp.zeros_like(x)
            for s in range(NUM_SAMPLES):
                z2 = dirichlet_sample(jax.random.fold_in(k, s), x.shape[0])
                z_new = t * z + (1.0 - t) * z2
                tv = jnp.full((x.shape[0],), t, jnp.float32)
                acc = acc + z_new + (1.0 - t) * model.apply(params, z_new, tv)
            return acc / NUM_SAMPLES, None

        x, _ = jax.lax.scan(
            step, x, jnp.arange(STEPS, dtype=jnp.float32)
        )
        return x

    x0 = dirichlet_sample(key, B)
    return solve(params, y, x0, jax.random.fold_in(key, 777))


# ---------------------------------------------------------------------------
# Diri_DFlow: LBFGS latent optimization with simplex penalty
# (Diri_DFlow.ipynb cells 2-4)


def flow_forward(model, params, z, steps=6):
    """Midpoint integration of the flow from the latent (d_flow.py:41-49)."""
    dt = 1.0 / steps

    def step(x, i):
        t = i * dt
        tv = jnp.full((x.shape[0],), t, jnp.float32)
        v1 = model.apply(params, x, tv)
        xm = x + 0.5 * dt * v1
        tm = jnp.full((x.shape[0],), t + 0.5 * dt, jnp.float32)
        return x + dt * model.apply(params, xm, tm), None

    x, _ = jax.lax.scan(step, z, jnp.arange(steps, dtype=jnp.float32))
    return x


def flow_inverse(model, params, x, steps=24):
    """Euler integration of the reverse flow 1 -> 0 (notebook
    inverse_flow_matching; the reference uses adaptive dopri5 — fixed
    steps keep the demo jit-static)."""
    dt = 1.0 / steps

    def step(h, i):
        t = 1.0 - i * dt
        tv = jnp.full((h.shape[0],), t, jnp.float32)
        return h - dt * model.apply(params, h, tv), None

    h, _ = jax.lax.scan(step, x, jnp.arange(steps, dtype=jnp.float32))
    return h


def dflow_dirichlet(model, params, y, H, key, reg_weight):
    import optax

    z0 = flow_inverse(model, params, H_adj_init(y))
    z = jnp.sqrt(0.1) * z0 + jnp.sqrt(0.9) * dirichlet_sample(key, B)

    def objective(z):
        x = flow_forward(model, params, z)
        fit = jnp.mean(jnp.sum((H(x) - y) ** 2, axis=(1, 2, 3)))
        simplex = jnp.mean(
            (jnp.sum(z, axis=(1, 2, 3)) - 1.0) ** 2
        )
        return fit + reg_weight * simplex

    solver = optax.lbfgs(
        memory_size=100,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20),
    )
    opt_state = solver.init(z)
    value_and_grad = optax.value_and_grad_from_state(objective)

    @jax.jit
    def lbfgs_step(z, opt_state):
        value, grad = value_and_grad(z, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, z, value=value, grad=grad, value_fn=objective
        )
        return optax.apply_updates(z, updates), opt_state, value

    for _ in range(DFLOW_STEPS):
        z, opt_state, value = lbfgs_step(z, opt_state)
    print("  final d_flow objective {:.4e}".format(float(value)))
    return flow_forward(model, params, z)


def H_adj_init(y):
    """Measurement-shaped init (notebook: upsample / pad with zeros) —
    dispatch on measurement shape: SR gets zero-fill upsample, half-image
    gets zero-pad, full-size is identity."""
    if y.shape[1] == DIM // 2 and y.shape[2] == DIM // 2:
        return upsample(y)
    if y.shape[1] == DIM // 2:
        return jnp.concatenate([y, jnp.zeros_like(y)], axis=1)
    return y


def save_grid(x, path, title):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f, axarr = plt.subplots(4, 4, figsize=(4, 4))
    arr = np.asarray(x)
    for k in range(4):
        for li in range(4):
            axarr[k, li].imshow(arr[k * 4 + li, :, :, 0], cmap="gray")
            axarr[k, li].get_yaxis().set_ticks([])
            axarr[k, li].get_xaxis().set_ticks([])
    f.suptitle(title)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    plt.savefig(path)
    plt.close(f)
    print("  wrote", path)


def main():
    key = jax.random.PRNGKey(0)
    print("1) training a Dirichlet-latent flow prior ...")
    model, params = train_dirichlet_flow(key)

    print("2) loading a simplex-normalized batch ...")
    batch = load_simplex_batch(key)
    save_grid(batch, os.path.join(OUT_DIR, "clean.png"), "clean")

    experiments = [
        # (name, H, measurement noise sigma, dflow simplex weight)
        ("sr2", lambda x: downsample(x, 2), 1e-4, 10000.0),
        ("denoising", lambda x: x, 1e-3, 10000.0),
        ("inpainting", lambda x: x[:, : DIM // 2, :, :], 1e-4, 100.0),
    ]
    adjoints = {
        "sr2": lambda y: upsample(y, 2),
        "denoising": lambda y: y,
        "inpainting": lambda y: jnp.concatenate(
            [y, jnp.zeros_like(y)], axis=1
        ),
    }

    for i, (name, H, sigma, reg) in enumerate(experiments):
        kmeas = jax.random.PRNGKey(i)
        y = H(batch) + sigma * jax.random.normal(kmeas, H(batch).shape)

        print("3.{}a) Diri_PnP {} ...".format(i, name))
        x_pnp = pnp_dirichlet(model, params, y, H, adjoints[name],
                              jax.random.fold_in(key, 10 + i))
        print("  simplex sums:", np.asarray(
            jnp.sum(x_pnp, axis=(1, 2, 3))[:4]))
        save_grid(x_pnp, os.path.join(OUT_DIR, "pnp_{}.png".format(name)),
                  "Diri_PnP " + name)

        print("3.{}b) Diri_DFlow {} ...".format(i, name))
        x_df = dflow_dirichlet(model, params, y, H,
                               jax.random.fold_in(key, 20 + i), reg)
        save_grid(x_df, os.path.join(OUT_DIR, "dflow_{}.png".format(name)),
                  "Diri_DFlow " + name)

    print("done — results in", OUT_DIR)


if __name__ == "__main__":
    main()
