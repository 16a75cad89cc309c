"""Scripted demo (equivalent of the reference demo/demo.ipynb): train a
small flow-matching model on synthetic data, then restore a deblurred image
with PnP-Flow — end to end, no external data or checkpoints.

Run: python demo/demo.py          (CPU is fine; a few minutes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pnpflow_tpu.data.datasets import DataLoaders
from pnpflow_tpu.models.unet import VelocityUNet
from pnpflow_tpu.ops.degradations import BoxInpainting
from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver
from pnpflow_tpu.training.flow_matching import (
    euler_sample,
    make_fm_train_step,
)

DIM = 32


def main():
    import optax

    print("1) building a small velocity U-Net ...")
    model = VelocityUNet(
        input_channels=3, input_height=DIM, ch=32, ch_mult=(1, 2),
        num_res_blocks=2, attn_resolutions=(16,),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, DIM, DIM, 3)), jnp.zeros((1,))
    )

    print("2) flow-matching training on synthetic images ...")
    tx = optax.adam(2e-4)
    step = make_fm_train_step(model.apply, tx, coupling="ot",
                              ot_method="sinkhorn")
    state = {
        "params": params, "opt_state": tx.init(params),
        "ema": jax.tree_util.tree_map(jnp.copy, params),
        "step": jnp.zeros((), jnp.int32),
    }
    loaders = DataLoaders("synthetic", 32, 8, dim_image=DIM,
                          num_channels=3).load_data()
    key = jax.random.PRNGKey(1)
    for epoch in range(5):
        for x1, _ in loaders["train"]:
            key, sub = jax.random.split(key)
            state, loss = step(state, jnp.asarray(x1), sub)
        print("   epoch", epoch, "loss", float(loss))

    print("3) sampling from the learned flow ...")
    samples = euler_sample(
        model.apply, state["ema"], jax.random.PRNGKey(2), (4, DIM, DIM, 3),
        steps=50,
    )
    print("   samples:", samples.shape)

    print("4) PnP-Flow restoration of a box-inpainting measurement ...")
    op = BoxInpainting(8, DIM)
    clean, _ = next(iter(loaders["test"]))
    clean = jnp.asarray(clean[:4])
    y = op.H(clean) + 0.05 * jax.random.normal(jax.random.PRNGKey(3),
                                               clean.shape)
    solve = make_pnp_flow_solver(
        model.apply, op.H, op.H_adj, steps=100, num_samples=3, lr_pnp=1.0,
        gamma_style="constant", alpha=1.0, noise_type="gaussian",
        sigma_noise=0.05,
    )
    x0 = op.H_adj(jnp.ones_like(y))
    x = solve(state["ema"], y, x0, jax.random.PRNGKey(4),
              jnp.asarray(0, jnp.int32), 100)

    def psnr(a, b):
        mse = jnp.mean(((a + 1) / 2 - (b + 1) / 2) ** 2)
        return float(10 * jnp.log10(1.0 / mse))

    print("   PSNR noisy    {:.2f} dB".format(psnr(y, clean)))
    print("   PSNR restored {:.2f} dB".format(psnr(x, clean)))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 4, figsize=(10, 8))
        for col in range(4):
            for row, (img, title) in enumerate(
                [(clean, "clean"), (y, "masked+noise"), (x, "pnp_flow")]
            ):
                axes[row][col].imshow(
                    np.clip((np.asarray(img[col]) + 1) / 2, 0, 1)
                )
                axes[row][col].axis("off")
                if col == 0:
                    axes[row][col].set_title(title, loc="left")
        fig.savefig("demo_restoration.png", dpi=110)
        print("   wrote demo_restoration.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
