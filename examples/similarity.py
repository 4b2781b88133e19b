"""Image-similarity metrics table (MSE / PSNR / MSSIM / MAE).

Analogue of /root/reference/examples/similarity/compare.cpp + the
cmp-tex.sh drivers: compare an image against degraded variants (here:
wavelet-thresholded reconstructions at several compression strengths)
and print the metric table, optionally as a LaTeX tabular (the
reference scripts' TeX output).
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp
from libdwt_tpu import wavedec2, waverec2
from libdwt_tpu.utils.testimg import test_image


def mse(a, b):
    """compare.cpp mse: mean squared error."""
    return jnp.mean((a - b) ** 2)


def psnr(a, b):
    """compare.cpp psnr: 10*log10(1/mse) (unit peak convention)."""
    return 10.0 * jnp.log10(1.0 / mse(a / 255.0, b / 255.0))


def _gauss_kernel(size=11, sigma=1.5):
    r = np.arange(size) - size // 2
    k = np.exp(-(r**2) / (2 * sigma * sigma))
    k /= k.sum()
    return jnp.asarray(np.outer(k, k), jnp.float32)


def _blur(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def mssim(a, b):
    """Mean structural similarity, the OpenCV-tutorial formulation used
    by the reference (compare.cpp getMSSIM; C1/C2 for 8-bit range)."""
    c1, c2 = 6.5025, 58.5225
    k = _gauss_kernel()
    mu1, mu2 = _blur(a, k), _blur(b, k)
    s1 = _blur(a * a, k) - mu1 * mu1
    s2 = _blur(b * b, k) - mu2 * mu2
    s12 = _blur(a * b, k) - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


def mae(a, b):
    return jnp.mean(jnp.abs(a - b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--tex", action="store_true", help="LaTeX tabular output")
    args = ap.parse_args()

    # 8-bit-range test image, like the reference's PGM inputs
    img = jnp.asarray(
        test_image(args.size, args.size, dtype=np.float32)
    )
    img = 255.0 * (img - img.min()) / float(img.max() - img.min())

    coeffs = wavedec2(img, args.wavelet, args.levels)

    @jax.jit
    def degrade(thr):
        shrunk = [coeffs[0]] + [
            tuple(jnp.where(jnp.abs(b) > thr, b, 0.0) for b in lvl)
            for lvl in coeffs[1:]
        ]
        return waverec2(shrunk, args.wavelet)

    metric_fns = {"MSE": mse, "PSNR[dB]": psnr, "MSSIM": mssim, "MAE": mae}
    rows = []
    for thr in (0.0, 1.0, 5.0, 20.0, 80.0):
        rec = degrade(jnp.float32(thr))
        kept = sum(
            int(jnp.sum(jnp.abs(b) > thr)) for lvl in coeffs[1:] for b in lvl
        )
        total = sum(int(b.size) for lvl in coeffs[1:] for b in lvl)
        vals = [float(fn(img, rec)) for fn in metric_fns.values()]
        rows.append((thr, 100.0 * kept / total, vals))

    hdr = ["thr", "kept[%]"] + list(metric_fns)
    if args.tex:
        print(r"\begin{tabular}{l" + "r" * (len(hdr) - 1) + "}")
        print(" & ".join(hdr) + r" \\ \hline")
        for thr, kept, vals in rows:
            cells = [f"{thr:g}", f"{kept:.1f}"] + [f"{v:.4g}" for v in vals]
            print(" & ".join(cells) + r" \\")
        print(r"\end{tabular}")
    else:
        print("\t".join(hdr))
        for thr, kept, vals in rows:
            print("\t".join([f"{thr:g}", f"{kept:.1f}"] + [f"{v:.4g}" for v in vals]))


if __name__ == "__main__":
    main()
