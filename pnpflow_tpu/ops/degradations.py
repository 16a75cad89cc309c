"""Degradation (physics) operators as pure jittable H / H_adj pairs.

TPU-native re-design of the reference physics layer
(pnpflow/degradations.py:6-127 and mask/kernel helpers in
pnpflow/utils.py:273-396).  All operators work on NHWC ``jnp`` arrays and are
closed over static filters/masks so they inline into a solver's ``lax.scan``
body under ``jit`` — the whole restoration loop stays resident in HBM.

Semantics parity notes (cited against the reference):
  * Box inpainting: centered square of half-size ``h`` zeroed
    (utils.py:327-336); mask is self-adjoint.
  * Random inpainting: Bernoulli(1-p) keep-mask drawn with a fixed
    numpy seed 42 per shape (utils.py:353-361) => the same mask for every
    batch, exactly like the reference.
  * Paintbrush inpainting: 10 random thick lines near the image center drawn
    with python ``random`` seeded 42 (utils.py:904-969); the same mask set is
    reused for every batch.
  * Gaussian deblurring (FFT): circular convolution with a normalized
    gaussian kernel embedded top-left in a zero canvas and rolled by
    -(ks-1)//2 (degradations.py:55-89); the adjoint multiplies by the complex
    conjugate in Fourier space — an exact adjoint.
  * Superresolution: strided decimation / zero-fill upsampling
    (utils.py:283-310); optional bicubic anti-aliasing filter
    (utils.py:365-396).  diag(H H^T) = I for plain decimation, which the
    solvers exploit in closed-form data-consistency solves.
"""

from __future__ import annotations

import random as _pyrandom

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# kernels


def gaussian_2d_kernel(sigma: float, size: int) -> np.ndarray:
    """Normalized 2-D gaussian kernel, identical grid to reference
    utils.py:273-280 (arange(-size//2+1, size//2+1))."""
    x = np.arange((-size) // 2 + 1.0, size // 2 + 1.0)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    kernel = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return (kernel / kernel.sum()).astype(np.float32)


def bicubic_filter(factor: int = 2) -> np.ndarray:
    """(4*factor, 4*factor) bicubic anti-aliasing filter
    (reference utils.py:365-396, a=-0.5)."""
    x = np.arange(start=-2 * factor + 0.5, stop=2 * factor, step=1) / factor
    a = -0.5
    x = np.abs(x)
    w = ((a + 2) * x**3 - (a + 3) * x**2 + 1) * (x <= 1)
    w += (a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a) * ((x > 1) & (x < 2))
    w = np.outer(w, w)
    return (w / w.sum()).astype(np.float32)


def _embed_and_roll(kernel: np.ndarray, dim: int) -> np.ndarray:
    """Place ``kernel`` top-left in a (dim, dim) zero canvas and roll by
    -(ks-1)//2 so its center sits at the origin — the circular-convolution
    filter layout of reference degradations.py:62-68."""
    ks = kernel.shape[0]
    canvas = np.zeros((dim, dim), dtype=np.float32)
    canvas[:ks, :ks] = kernel
    shift = -(ks - 1) // 2
    return np.roll(canvas, (shift, shift), axis=(0, 1))


# ---------------------------------------------------------------------------
# operators


class Degradation:
    """A linear measurement operator: pure functions H and H_adj on NHWC."""

    def H(self, x):
        raise NotImplementedError

    def H_adj(self, x):
        raise NotImplementedError


class Denoising(Degradation):
    """Identity operator (reference degradations.py:15-21)."""

    def H(self, x):
        return x

    def H_adj(self, x):
        return x


class MaskedInpainting(Degradation):
    """Shared base for all mask-based inpainting: H = H_adj = mask * x."""

    def __init__(self, mask: np.ndarray):
        # mask broadcastable against NHWC.  Kept as a HOST (numpy) array so
        # it embeds as a literal constant at trace time — a closed-over
        # device array would force a device->host copy during lowering.
        self.mask = np.asarray(mask, dtype=np.float32)

    def H(self, x):
        return self.mask * x

    def H_adj(self, x):
        return self.mask * x


class BoxInpainting(MaskedInpainting):
    """Centered square of half-size ``half_size_mask`` zeroed
    (reference degradations.py:23-33, utils.py:327-336)."""

    def __init__(self, half_size_mask: int, dim_image: int):
        d = dim_image // 2
        h = half_size_mask
        mask = np.ones((1, dim_image, dim_image, 1), dtype=np.float32)
        mask[:, d - h : d + h, d - h : d + h, :] = 0.0
        self.half_size_mask = half_size_mask
        super().__init__(mask)


class RandomInpainting(MaskedInpainting):
    """Bernoulli(1-p) pixel keep-mask, fixed numpy seed 42 so the mask is
    identical across calls and batches (reference utils.py:353-361)."""

    def __init__(self, p: float, dim_image: int, batch_size: int):
        np.random.seed(42)
        mask = np.random.binomial(
            n=1, p=1 - p, size=(batch_size, dim_image, dim_image)
        ).astype(np.float32)[..., None]
        self.p = p
        super().__init__(mask)


def _paintbrush_masks(
    height: int, width: int, batch_size: int, rand_seed: int = 42
) -> np.ndarray:
    """Random thick-line paintbrush masks (reference utils.py:904-969).

    Ten lines with endpoints uniform in [c-30, c+30] around the center and
    thickness uniform in [8, 0.08*(h+w)], drawn per image; seeded once so the
    whole mask set is deterministic and reused for every batch (the reference
    re-seeds its generator at every call).
    """
    rng = _pyrandom.Random(rand_seed)
    size = int((width + height) * 0.08)
    if width < 64 or height < 64:
        raise ValueError("Width and Height of mask must be at least 64!")

    try:
        import cv2

        have_cv2 = True
    except ImportError:  # numpy Bresenham fallback
        have_cv2 = False

    masks = np.empty((batch_size, height, width, 1), dtype=np.float32)
    for b in range(batch_size):
        img = np.zeros((height, width, 1), np.uint8)
        for _ in range(10):
            x1 = rng.randint(width // 2 - 30, width // 2 + 30)
            x2 = rng.randint(width // 2 - 30, width // 2 + 30)
            y1 = rng.randint(height // 2 - 30, height // 2 + 30)
            y2 = rng.randint(height // 2 - 30, height // 2 + 30)
            thickness = rng.randint(8, size)
            if have_cv2:
                cv2.line(img, (x1, y1), (x2, y2), (255, 255, 255), thickness)
            else:
                _draw_thick_line(img, x1, y1, x2, y2, thickness)
        # keep pixels not painted over
        masks[b] = (img == 0).astype(np.float32)
    return masks


def _draw_thick_line(img, x1, y1, x2, y2, thickness):
    """Distance-to-segment rasterization used when cv2 is unavailable."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    px, py = x2 - x1, y2 - y1
    norm2 = max(px * px + py * py, 1)
    t = np.clip(((xx - x1) * px + (yy - y1) * py) / norm2, 0.0, 1.0)
    dist2 = (xx - (x1 + t * px)) ** 2 + (yy - (y1 + t * py)) ** 2
    img[dist2 <= (thickness / 2.0) ** 2] = 255


class PaintbrushInpainting(MaskedInpainting):
    """Paintbrush mask inpainting (reference degradations.py:47-53)."""

    def __init__(self, dim_image: int, batch_size: int):
        super().__init__(_paintbrush_masks(dim_image, dim_image, batch_size))


class GaussianDeblurring(Degradation):
    """Circular gaussian blur via FFT with exact conjugate adjoint
    (reference degradations.py:55-89)."""

    def __init__(
        self,
        sigma_blur: float,
        kernel_size: int,
        mode: str = "fft",
        num_channels: int = 3,
        dim_image: int = 128,
    ):
        self.mode = mode
        self.sigma = sigma_blur
        self.kernel_size = kernel_size
        self.kernel = gaussian_2d_kernel(sigma_blur, kernel_size)
        filt = _embed_and_roll(self.kernel, dim_image)
        # fft of the rolled filter; real kernel => H_adj uses conj.
        # (H, W) broadcasting over batch and channels (NHWC fft over axes 1,2)
        # Host-side constant (see MaskedInpainting note).
        self.fft_filter = np.fft.fft2(filt).astype(np.complex64)[
            None, :, :, None
        ]

    def H(self, x):
        if self.mode != "fft":
            return self._conv_same(x)
        return jnp.real(
            jnp.fft.ifft2(
                jnp.fft.fft2(x, axes=(1, 2)) * self.fft_filter, axes=(1, 2)
            )
        )

    def H_adj(self, x):
        if self.mode != "fft":
            return self._conv_same(x)  # symmetric kernel => self-adjoint conv
        return jnp.real(
            jnp.fft.ifft2(
                jnp.fft.fft2(x, axes=(1, 2)) * jnp.conj(self.fft_filter),
                axes=(1, 2),
            )
        )

    def _conv_same(self, x):
        """Depthwise 'same' conv path (reference degradations.py:72-76)."""
        import jax.lax as lax

        c = x.shape[-1]
        k = jnp.asarray(self.kernel)[:, :, None, None]
        k = jnp.tile(k, (1, 1, 1, c))  # HWIO with feature_group_count=C
        return lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class Superresolution(Degradation):
    """s-fold decimation with zero-fill adjoint; optional bicubic AA filter
    (reference degradations.py:92-127, utils.py:283-310,365-396)."""

    def __init__(self, sf: int, dim_image: int, mode: str | None = None):
        self.sf = sf
        self.mode = mode
        self.dim_image = dim_image
        if mode == "bicubic":
            bf = bicubic_filter(sf)
            filt = _embed_and_roll(bf, dim_image)
            self.fft_filter = np.fft.fft2(filt).astype(np.complex64)[
                None, :, :, None
            ]

    def downsample(self, x):
        return x[:, :: self.sf, :: self.sf, :]

    def upsample(self, x):
        b, h, w, c = x.shape
        z = jnp.zeros((b, h * self.sf, w * self.sf, c), dtype=x.dtype)
        return z.at[:, :: self.sf, :: self.sf, :].set(x)

    def H(self, x):
        if self.mode is None:
            return self.downsample(x)
        x_ = jnp.real(
            jnp.fft.ifft2(
                jnp.fft.fft2(x, axes=(1, 2)) * self.fft_filter, axes=(1, 2)
            )
        )
        return self.downsample(x_)

    def H_adj(self, x):
        if self.mode is None:
            return self.upsample(x)
        x_ = self.upsample(x)
        return jnp.real(
            jnp.fft.ifft2(
                jnp.fft.fft2(x_, axes=(1, 2)) * jnp.conj(self.fft_filter),
                axes=(1, 2),
            )
        )

    # closed-form diagonals used by ot_ode / pnp_diff instead of the
    # reference's explicit (M, N) downsampling matrix (utils.py:1124-1146):
    # for plain decimation D, diag(D D^T) = 1 and diag(D^T D) is the
    # keep-pixel mask — mathematically identical, O(N) instead of O(N^2).
    def diag_HHt(self) -> float:
        return 1.0

    def keep_mask(self) -> np.ndarray:
        m = np.zeros((1, self.dim_image, self.dim_image, 1), dtype=np.float32)
        m[:, :: self.sf, :: self.sf, :] = 1.0
        return m


# ---------------------------------------------------------------------------
# factory mirroring the reference driver's per-problem defaults
# (main.py:120-179)


def make_degradation(args, batch_size: int | None = None):
    """Build (degradation, sigma_noise) for ``args.problem`` with the exact
    per-problem noise defaults hard-coded in the reference driver."""
    problem = args.problem
    noise_type = args.noise_type
    dim = args.dim_image
    bs = batch_size if batch_size is not None else args.batch_size_ip

    def sigma(gauss):
        return 0.3 if noise_type == "laplace" else gauss

    if problem == "denoising":
        return Denoising(), sigma(0.2)
    if problem == "inpainting":
        half = 20 if dim == 128 else 40
        return BoxInpainting(half, dim), sigma(0.05)
    if problem == "paintbrush_inpainting":
        return PaintbrushInpainting(dim, bs), sigma(0.05)
    if problem == "random_inpainting":
        return RandomInpainting(0.7, dim, bs), sigma(0.01)
    if problem in ("superresolution", "superresolution_bicubic"):
        sf = 2 if dim == 128 else 4
        mode = "bicubic" if problem == "superresolution_bicubic" else None
        return Superresolution(sf, dim, mode=mode), sigma(0.05)
    if problem == "gaussian_deblurring_FFT":
        sigma_blur = 1.0 if dim == 128 else 3.0
        return (
            GaussianDeblurring(
                sigma_blur, 61, "fft", args.num_channels, dim
            ),
            sigma(0.05),
        )
    raise ValueError("Unknown problem: {}".format(problem))
