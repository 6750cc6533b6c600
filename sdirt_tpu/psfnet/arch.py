"""Implicit PSF network architectures (Flax).

Parity source: /root/reference/deeplens/psfnet_arch.py. The production model
is the plain MLP (psfnet.py:75-76): (x, y, z) -> ks^2 left-PSF, ReLU
everywhere including the output (PSFs are non-negative). Layer shapes are
kept identical (3 -> 128 -> 512 x9 -> ks^2) so reference checkpoints can be
ported weight-for-weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torch kaiming_uniform_ (fan_in, gain sqrt(2)) equivalent
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class PSFMLP(nn.Module):
    """3 -> hidden/4 -> hidden -> [hidden x hidden_layers] -> out, all-ReLU."""

    out_features: int
    hidden_features: int = 512
    hidden_layers: int = 8

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_features // 4, self.hidden_features]
        dims += [self.hidden_features] * self.hidden_layers
        dims += [self.out_features]
        for d in dims:
            x = nn.relu(nn.Dense(d, kernel_init=kaiming_uniform,
                                 bias_init=nn.initializers.zeros)(x))
        return x

    @property
    def ks(self) -> int:
        return int(round(self.out_features ** 0.5))


class PSFMLPBasis(nn.Module):
    """PSFMLP trunk -> ReLU'd K-dim coefficient bottleneck -> LINEAR basis
    expansion to ks^2 taps.

    A TPU-native student head the reference doesn't have: because the final
    layer is linear, the per-pixel spatially-varying DP convolution
    (reference render_psf.py:120-155) factors through the basis —
        sum_t psf[px, t] * img[px + t]
      = sum_k coeff[px, k] * (B_k (*) img)[px]  +  (b (*) img)[px]
    so rendering needs only K dense 21x21 convolutions on the MXU plus an
    elementwise K-contraction, never materializing the [H, W, ks^2] PSF
    tensor (render/basis.py). The PSF family traced by the lens is a smooth
    ~3-parameter manifold (x, y, depth), so a small K suffices; fidelity is
    gated on real captures like every other render variant
    (scripts/gate_render_variants.py).

    Layer layout is PSFMLP's with one extra Dense, so fit/checkpoint/GEMM
    code paths (render/mlp_fast.dense_layers) work unchanged, and a plain
    PSFMLP checkpoint warm-starts the trunk weight-for-weight.
    """

    out_features: int
    hidden_features: int = 256
    hidden_layers: int = 8
    basis_k: int = 64

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_features // 4, self.hidden_features]
        dims += [self.hidden_features] * self.hidden_layers
        dims += [self.basis_k]
        for d in dims:
            x = nn.relu(nn.Dense(d, kernel_init=kaiming_uniform,
                                 bias_init=nn.initializers.zeros)(x))
        # linear basis expansion — NO output ReLU (linearity is the point);
        # MSE against non-negative traced PSFs drives taps >= -epsilon
        return nn.Dense(self.out_features, kernel_init=kaiming_uniform,
                        bias_init=nn.initializers.zeros)(x)

    @property
    def ks(self) -> int:
        return int(round(self.out_features ** 0.5))


class PSFMLPLum(nn.Module):
    """MLP predicting a PSF kernel plus a luminance scalar. The reference's
    MLP_lum (psfnet_arch.py:58-82) crashes on instantiation (super(MLP, ...)
    typo); this is the intended behavior, working."""

    out_features: int   # ks^2 + 1
    hidden_features: int = 512
    hidden_layers: int = 8

    @nn.compact
    def __call__(self, x):
        dims = [self.hidden_features // 4, self.hidden_features]
        dims += [self.hidden_features] * self.hidden_layers
        for d in dims:
            x = nn.relu(nn.Dense(d, kernel_init=kaiming_uniform)(x))
        x = nn.Dense(self.out_features, kernel_init=kaiming_uniform)(x)
        ks = int(round((self.out_features - 1) ** 0.5))
        psf = x[..., :-1].reshape(*x.shape[:-1], ks, ks)
        lum = x[..., -1:]
        return psf, lum


class MLPConv(nn.Module):
    """MLP encoder + deconv decoder (reference psfnet_arch.py:84-144),
    for high-frequency PSFs. Kept for feature parity; unused by default."""

    ks: int
    channels: int = 1

    @nn.compact
    def __call__(self, x):
        ks_mlp = self.ks // 4
        h = x
        for d in (256, 256, 512, self.channels * ks_mlp**2):
            h = nn.Dense(d, kernel_init=kaiming_uniform)(h)
            if d != self.channels * ks_mlp**2:
                h = nn.relu(h)
        h = h.reshape(-1, ks_mlp, ks_mlp, self.channels)
        for _ in range(2):
            h = nn.relu(nn.ConvTranspose(64, (3, 3), padding="SAME")(h))
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        for _ in range(2):
            h = nn.relu(nn.ConvTranspose(64, (3, 3), padding="SAME")(h))
        # CustomUpsample(2.1) via resize to the final kernel size
        import jax.image

        h = jax.image.resize(h, (h.shape[0], self.ks, self.ks, h.shape[-1]), "bilinear")
        h = nn.relu(nn.ConvTranspose(64, (3, 3), padding="SAME")(h))
        h = nn.ConvTranspose(self.channels, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        out = h[..., 0]
        return out.reshape(*x.shape[:-1], self.ks, self.ks)


class Siren(nn.Module):
    """Sinusoidal implicit network (reference psfnet_arch.py:147-206);
    available for experimentation, unused by the shipped pipeline."""

    out_features: int
    hidden_features: int = 256
    hidden_layers: int = 4
    w0: float = 30.0

    @nn.compact
    def __call__(self, x):
        def sym_uniform(bound):
            # SIREN wants weights symmetric in [-bound, bound];
            # nn.initializers.uniform(scale=s) samples [0, s) only.
            def init(key, shape, dtype=jnp.float32):
                import jax

                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return init

        for i in range(self.hidden_layers):
            fan_in = x.shape[-1]
            if i == 0:
                init = sym_uniform(1.0 / fan_in)
            else:
                init = sym_uniform(float(np.sqrt(6.0 / fan_in) / self.w0))
            dense = nn.Dense(self.hidden_features, kernel_init=init)
            x = jnp.sin(self.w0 * dense(x))
        return nn.Dense(self.out_features)(x)


def build_psfnet(model_name: str, ks: int) -> nn.Module:
    """Factory (reference psfnet.py:62-89). "mlp@W" selects a narrower
    PSFMLP trunk (e.g. "mlp@256") — a render-throughput option the
    reference doesn't have; fidelity is gated the same way as the
    default width (scripts/gate_render_variants.py)."""
    if model_name.startswith("mlpb@"):
        # "mlpb@WIDTHxK": linear-output basis student (PSFMLPBasis) —
        # enables the MXU basis-convolution render path (render/basis.py)
        spec = model_name.split("@")[1]
        width, _, k = spec.partition("x")
        return PSFMLPBasis(out_features=ks * ks,
                           hidden_features=int(width),
                           basis_k=int(k) if k else 64)
    if model_name.startswith("mlp@"):
        return PSFMLP(out_features=ks * ks,
                      hidden_features=int(model_name.split("@")[1]))
    if model_name == "mlp":
        return PSFMLP(out_features=ks * ks)
    if model_name == "mlpconv":
        return MLPConv(ks=ks)
    if model_name == "mlp+lum":
        return PSFMLPLum(out_features=ks * ks + 1)
    if model_name == "siren":
        return Siren(out_features=ks * ks)
    raise ValueError(f"Unsupported PSF network architecture: {model_name}")


def load_torch_psfnet(params, path: str):
    """Port a reference PyTorch MLP checkpoint (.pkl state_dict) into Flax
    params, matching layers in order (reference psfnet.py:91-98 does a
    shape-filtered partial load; we do the same)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    weights = [(k, v) for k, v in sd.items() if k.endswith("weight")]
    biases = [(k, v) for k, v in sd.items() if k.endswith("bias")]
    weights.sort(key=lambda kv: int(kv[0].split(".")[-2]))
    biases.sort(key=lambda kv: int(kv[0].split(".")[-2]))

    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    new = dict(flat)
    dense_keys = sorted({k.rsplit("/", 1)[0] for k in flat if "Dense" in k},
                        key=lambda s: int(s.split("Dense_")[-1]))
    for i, dk in enumerate(dense_keys):
        if i >= len(weights):
            break
        w = jnp.asarray(weights[i][1].numpy().T)
        b = jnp.asarray(biases[i][1].numpy())
        if new[f"{dk}/kernel"].shape == w.shape:
            new[f"{dk}/kernel"] = w
        if new[f"{dk}/bias"].shape == b.shape:
            new[f"{dk}/bias"] = b
    return flax.traverse_util.unflatten_dict(new, sep="/")
