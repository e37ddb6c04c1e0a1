"""Quantify the 512-canvas deviation of the 2D chest pipeline.

The reference crops each X-ray at NATIVE resolution on CPU workers
(reference ``chestDataset.py:31-48``, ``data.py:19-29``; NIH images are
1024²).  Our host loader decodes to a fixed canvas (default 512) before the
on-device crop — halving source resolution ahead of every crop.  This tool
measures what that costs: for a set of NIH-statistics-like synthetic images
(and any real PNGs passed on argv), it cuts the SAME RandomResizedCrop boxes
two ways —

  native : crop the 1024² image → resize to 224          (reference path)
  canvas : resize 1024² → 512² → crop → resize to 224    (our default path)

— and reports RMSE / PSNR between the two 224² views plus the
high-frequency (top-half-spectrum) energy ratio.  Results recorded in
BENCHMARKS.md; ``--chest_canvas 1024`` removes the deviation entirely.

Run: JAX_PLATFORMS=cpu python tools/measure_canvas_loss.py [real.png ...]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def synth_xray(seed: int, n: int = 1024) -> np.ndarray:
    """1/f-spectrum image with sharp line structures — the frequency content
    a chest film has (ribs, catheters, text markers)."""
    rng = np.random.RandomState(seed)
    f = np.fft.fftfreq(n)
    radius = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    spec = (rng.randn(n, n) + 1j * rng.randn(n, n)) / np.maximum(radius, 1e-3)
    img = np.real(np.fft.ifft2(spec))
    img = (img - img.min()) / (img.max() - img.min())
    for _ in range(12):  # thin bright lines (1-2 px): genuinely >512 content
        y = rng.randint(50, n - 50)
        img[y:y + rng.randint(1, 3), rng.randint(0, n // 2):] += 0.35
    img = np.clip(img, 0, 1)
    return np.repeat(img[None], 3, axis=0).astype(np.float32)  # CHW


def hf_energy(v: np.ndarray) -> float:
    """Energy in the top half of the radial spectrum (per-channel mean)."""
    spec = np.abs(np.fft.fft2(v, axes=(-2, -1))) ** 2
    n = v.shape[-1]
    f = np.fft.fftfreq(n)
    radius = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    return float(spec[..., radius > 0.25].sum() / spec.sum())


def main():
    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.data.augment2d import crop_and_resize, \
        sample_resized_crop_box

    images = [synth_xray(s) for s in range(4)]
    for path in sys.argv[1:]:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
        images.append(arr.transpose(2, 0, 1))

    resize_to = jax.jit(
        lambda img, size: crop_and_resize(
            img, (0.0, 0.0, float(img.shape[1]), float(img.shape[2])), size),
        static_argnums=1)

    rmses, psnrs, hf_native, hf_canvas = [], [], [], []
    for i, img in enumerate(images):
        n = img.shape[1]
        img_j = jnp.asarray(img)
        img_512 = resize_to(img_j, 512)
        for crop_seed in range(8):
            key = jax.random.key(1000 * i + crop_seed)
            box = sample_resized_crop_box(key, (float(n), float(n)),
                                          (0.3, 1.0))
            box = tuple(float(b) for b in box)
            native = np.asarray(crop_and_resize(img_j, box, 224))
            scale = 512.0 / n
            box_c = tuple(b * scale for b in box)
            canvas = np.asarray(crop_and_resize(img_512, box_c, 224))
            err = native - canvas
            rmse = float(np.sqrt((err ** 2).mean()))
            rmses.append(rmse)
            psnrs.append(20 * np.log10(1.0 / max(rmse, 1e-9)))
            hf_native.append(hf_energy(native))
            hf_canvas.append(hf_energy(canvas))

    print(f"views compared: {len(rmses)} "
          f"({len(images)} images x 8 RandomResizedCrop boxes, scale .3-1)")
    print(f"RMSE  native-vs-512canvas : mean {np.mean(rmses):.4f}  "
          f"max {np.max(rmses):.4f}  (images in [0,1])")
    print(f"PSNR                      : mean {np.mean(psnrs):.1f} dB  "
          f"min {np.min(psnrs):.1f} dB")
    print(f"HF energy (|f|>0.25) kept : "
          f"{np.mean(hf_canvas) / np.mean(hf_native) * 100:.1f}% "
          f"(native {np.mean(hf_native):.4f} -> canvas "
          f"{np.mean(hf_canvas):.4f})")


if __name__ == "__main__":
    main()
