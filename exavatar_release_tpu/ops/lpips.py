"""LPIPS perceptual distance (VGG16 / AlexNet backbones) in pure JAX.

Replaces the reference's ``lpips`` package usage (reference
avatar/common/nets/loss.py:80-97, net='vgg') and the torchmetrics
LPIPS-alex eval metric (reference avatar/tools/eval_neuman.py:28). The
backbone is expressed as plain conv pytrees; pretrained torchvision weights
convert offline with ``convert_torch_lpips`` (no network access assumed at
runtime — weights load from an .npz the user produces once).

Semantics (lpips v0.1): input in [-1, 1], imagenet-style shift/scale,
backbone features at 5 taps, channel-unit-normalization, 1x1 linear heads,
spatial mean, sum over taps.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# lpips scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, layers_in_block); taps after each block's relu
VGG16_PLAN: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
ALEX_PLAN = "alex"  # handled separately


@flax.struct.dataclass
class LPIPSParams:
    conv_weights: Tuple[jnp.ndarray, ...]  # each (O, I, kh, kw)
    conv_biases: Tuple[jnp.ndarray, ...]
    lin_weights: Tuple[jnp.ndarray, ...]  # 5 heads, each (C_tap,)
    net: str = flax.struct.field(pytree_node=False)  # 'vgg' | 'alex'


def _conv(x, w, b, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def vgg16_features(params: LPIPSParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) -> 5 tap activations (after the last relu per block)."""
    taps = []
    i = 0
    for block, (ch, n_layers) in enumerate(VGG16_PLAN):
        for _ in range(n_layers):
            x = jax.nn.relu(_conv(x, params.conv_weights[i], params.conv_biases[i]))
            i += 1
        taps.append(x)
        if block < len(VGG16_PLAN) - 1:
            x = _maxpool(x)
    return taps


def alexnet_features(params: LPIPSParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """torchvision AlexNet.features taps after each of the 5 relus."""
    w, b = params.conv_weights, params.conv_biases
    taps = []
    x = jax.nn.relu(_conv(x, w[0], b[0], stride=4, padding=2))
    taps.append(x)
    x = _maxpool(x, 3, 2)
    x = jax.nn.relu(_conv(x, w[1], b[1], padding=2))
    taps.append(x)
    x = _maxpool(x, 3, 2)
    x = jax.nn.relu(_conv(x, w[2], b[2], padding=1))
    taps.append(x)
    x = jax.nn.relu(_conv(x, w[3], b[3], padding=1))
    taps.append(x)
    x = jax.nn.relu(_conv(x, w[4], b[4], padding=1))
    taps.append(x)
    return taps


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(
    params: LPIPSParams,
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LPIPS distance between (3, H, W) images in [-1, 1]; returns scalar.

    ``mask`` (H, W): masked spatial mean of each tap's distance map
    (static-shape replacement for the reference's bbox crop,
    loss.py:86-93 — see image_metrics.bbox_mask).
    """
    x = jnp.stack([img0, img1], axis=0)  # (2, 3, H, W)
    x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    feats = (vgg16_features if params.net == "vgg" else alexnet_features)(params, x)
    total = 0.0
    for tap, lin_w in zip(feats, params.lin_weights):
        f0 = _unit_normalize(tap[0:1])
        f1 = _unit_normalize(tap[1:2])
        diff = (f0 - f1) ** 2  # (1, C, h, w)
        dist = jnp.sum(diff * jnp.maximum(lin_w, 0.0)[None, :, None, None], axis=1)[0]
        if mask is not None:
            # downsample mask to tap resolution by average pooling
            h, w = dist.shape
            m = jax.image.resize(mask, (h, w), "linear")
            total = total + jnp.sum(dist * m) / jnp.maximum(jnp.sum(m), 1.0)
        else:
            total = total + jnp.mean(dist)
    return total


def init_lpips_random(key: jax.Array, net: str = "vgg") -> LPIPSParams:
    """Deterministic random-weight LPIPS (architecture-correct; for tests and
    for running without the converted pretrained weights)."""
    ws, bs = [], []
    if net == "vgg":
        cin = 3
        shapes = []
        for ch, n_layers in VGG16_PLAN:
            for _ in range(n_layers):
                shapes.append((ch, cin, 3, 3))
                cin = ch
        tap_dims = [ch for ch, _ in VGG16_PLAN]
    else:
        shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                  (256, 384, 3, 3), (256, 256, 3, 3)]
        tap_dims = [64, 192, 384, 256, 256]
    keys = jax.random.split(key, len(shapes) + len(tap_dims))
    for i, s in enumerate(shapes):
        fan_in = s[1] * s[2] * s[3]
        ws.append(jax.random.normal(keys[i], s) * (2.0 / fan_in) ** 0.5)
        bs.append(jnp.zeros((s[0],)))
    lins = tuple(
        jax.nn.relu(jax.random.normal(keys[len(shapes) + i], (d,))) * 0.1 + 0.01
        for i, d in enumerate(tap_dims)
    )
    return LPIPSParams(tuple(ws), tuple(bs), lins, net)


def load_lpips(npz_path: str) -> LPIPSParams:
    """Load weights converted by ``convert_torch_lpips``."""
    d = np.load(npz_path)
    n_conv = int(d["n_conv"])
    ws = tuple(jnp.asarray(d[f"conv_w_{i}"]) for i in range(n_conv))
    bs = tuple(jnp.asarray(d[f"conv_b_{i}"]) for i in range(n_conv))
    lins = tuple(jnp.asarray(d[f"lin_{i}"]) for i in range(5))
    return LPIPSParams(ws, bs, lins, str(d["net"]))


def save_lpips(npz_path: str, params: LPIPSParams) -> None:
    """Write params in the same .npz layout ``load_lpips`` reads."""
    out = {"n_conv": len(params.conv_weights), "net": params.net}
    for i, (w, b) in enumerate(zip(params.conv_weights, params.conv_biases)):
        out[f"conv_w_{i}"] = np.asarray(w)
        out[f"conv_b_{i}"] = np.asarray(b)
    for i, lin in enumerate(params.lin_weights):
        out[f"lin_{i}"] = np.asarray(lin)
    np.savez(npz_path, **out)


def convert_torch_lpips(out_path: str, net: str = "vgg") -> None:
    """One-time offline conversion of lpips-package weights to .npz.

    Requires the ``lpips`` pip package with its pretrained weights available
    (run in an environment with network/weights; this repo runs without)."""
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net=net)
    convs = [m for m in model.net.modules() if m.__class__.__name__ == "Conv2d"]
    out = {"n_conv": len(convs), "net": net}
    for i, c in enumerate(convs):
        out[f"conv_w_{i}"] = c.weight.detach().numpy()
        out[f"conv_b_{i}"] = c.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        out[f"lin_{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **out)


# torchvision nn.Sequential indices of the Conv2d layers in `.features`
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_ALEX_CONV_IDX = (0, 3, 6, 8, 10)


def _sd_array(v) -> np.ndarray:
    """Accept torch tensors or numpy arrays from a loaded state_dict."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_torch_state_dicts(
    out_path: str, features_sd: dict, lins_sd: dict, net: str = "vgg"
) -> None:
    """Convert raw torch state_dicts to the .npz layout ``load_lpips`` reads.

    Unlike ``convert_torch_lpips`` this needs NO ``lpips``/torchvision
    import — only the two checkpoint files, so it runs anywhere torch can
    ``torch.load`` them:

    * ``features_sd``: ``torchvision.models.vgg16().features.state_dict()``
      (keys ``0.weight`` ...; a full-model state_dict with ``features.``
      prefixes also works), or alexnet's ``.features`` equivalent;
    * ``lins_sd``: the lpips v0.1 head checkpoint
      (``lpips/weights/v0.1/{vgg,alex}.pth`` — keys
      ``lin{i}.model.1.weight`` of shape (1, C, 1, 1)).

    Fixture-tested (tests/test_image_metrics.py TestLPIPSConverter): a
    synthetic torchvision-layout state_dict converts and the JAX features
    bit-match a torch replica of the backbone.
    """
    conv_idx = _VGG16_CONV_IDX if net == "vgg" else _ALEX_CONV_IDX

    def feat_key(i: int, leaf: str) -> str:
        for k in (f"{i}.{leaf}", f"features.{i}.{leaf}"):
            if k in features_sd:
                return k
        raise KeyError(
            f"state_dict missing conv {i} ({leaf}); expected torchvision "
            f"`.features` layout with Conv2d at indices {conv_idx}"
        )

    out = {"n_conv": len(conv_idx), "net": net}
    for j, i in enumerate(conv_idx):
        out[f"conv_w_{j}"] = _sd_array(features_sd[feat_key(i, "weight")])
        out[f"conv_b_{j}"] = _sd_array(features_sd[feat_key(i, "bias")])

    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lin{i}.weight", f"lin_{i}"):
            if k in lins_sd:
                out[f"lin_{i}"] = _sd_array(lins_sd[k]).reshape(-1)
                break
        else:
            raise KeyError(
                f"lins state_dict missing head {i}; expected lpips-v0.1 "
                f"keys lin{i}.model.1.weight"
            )
    np.savez(out_path, **out)


def _main() -> None:
    """CLI: one-command .npz production from checkpoint files.

    python -m exavatar_release_tpu.ops.lpips --net vgg \\
        --backbone vgg16_features.pth --lins lpips_v01_vgg.pth \\
        --out lpips_vgg.npz

    (or, with the ``lpips`` pip package installed, just
    ``--from_lpips_pkg`` — no checkpoint files needed.)"""
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("--net", default="vgg", choices=["vgg", "alex"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--backbone", help="torch .pth of the backbone .features")
    ap.add_argument("--lins", help="lpips v0.1 linear-head .pth")
    ap.add_argument("--from_lpips_pkg", action="store_true")
    args = ap.parse_args()

    if args.from_lpips_pkg:
        convert_torch_lpips(args.out, args.net)
    else:
        if not (args.backbone and args.lins):
            ap.error("need --backbone and --lins (or --from_lpips_pkg)")
        import torch  # type: ignore

        convert_torch_state_dicts(
            args.out,
            torch.load(args.backbone, map_location="cpu"),
            torch.load(args.lins, map_location="cpu"),
            args.net,
        )
    # round-trip sanity: the file must load
    p = load_lpips(args.out)
    print(f"wrote {args.out}: net={p.net}, {len(p.conv_weights)} convs, "
          f"lin dims {[int(w.shape[0]) for w in p.lin_weights]}")


if __name__ == "__main__":
    _main()
