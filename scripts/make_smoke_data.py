"""Build a synthetic FlyingChairs-layout dataset for e2e smoke runs.

Usage: make_smoke_data.py [root] [--pairs N] [--rich] [--size H W]
       [--motion affine|shift]

`--size` (default 96 128): frame size. PWC-family fixture training needs
larger frames (e.g. 192 256) — its 6-level /64 pyramid is degenerate at
the default smoke size (level 6 = 1x2 px) and the net underfits to the
data mean.

Default (8 pairs, integer-shifted noise frames) matches the original smoke
tree. `--rich` writes textured frames (smoothed noise, so the correlation
volume has structure at every scale) whose second frame is an exact affine
warp of the first with the matching dense GT flow — a learnable-but-not-
memorizable signal used to train the `tests/fixtures/trained_smoke.npz`
gate weights further than the shift-only set allows (which a few hundred
steps already overfit — BENCH.md round 3).

`--motion shift` (with `--rich`) restricts the warp to pure translation
(ang=0, scale=1, t in [-max_shift, max_shift]^2; `--max-shift` default 4).
PWC-family fixtures use this with `--max-shift 24`. Round 4 added
`--min-shift M` (per-axis |t| in [M, max] with random sign; frames get a
max-shift margin + center-crop so GT is exact everywhere) to test the
coarse-level-energy hypothesis: 48-112 px shifts at 384x512 put 0.75-1.75
px of motion at /64 — and short-schedule PWC STILL flatlines (BENCH.md
round-4 closure table). Measured caveat stands: NO
smoke distribution makes short-schedule PWC converge — subpixel shifts
(|t|<=4 is subpixel at EVERY level of the 1/4-res-finest 81-bin
integer-displacement correlation; val AEPE 2.78 vs zero-flow baseline
2.68 after 1400 steps), +-24 shifts (16.59 vs 16.11 after 1400; /32 and
/64 levels still subpixel, scale aug widens the distribution), and affine
(3.75 vs 3.71 after 2100) all sit at the zero-flow baseline. The family
genuinely needs its reference schedule (~1.2M steps); trainer
faithfulness is gated per-step instead (tests/test_trainer_parity_pwc.py)
and the fixture serves the numeric gates (tests/test_trained_gates_pwc.py).
"""
import os, sys
import numpy as np
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from focusflow_official_tpu.data.io import write_flo
from PIL import Image
import cv2

argv = [a for a in sys.argv[1:]]
root = argv[0] if argv and not argv[0].startswith('--') else '/tmp/ff_smoke'
n = int(argv[argv.index('--pairs') + 1]) if '--pairs' in argv else 8
rich = '--rich' in argv
motion = argv[argv.index('--motion') + 1] if '--motion' in argv else 'affine'
assert motion in ('affine', 'shift'), motion
max_shift = (float(argv[argv.index('--max-shift') + 1])
             if '--max-shift' in argv else 4.0)
# --min-shift M: per-axis |t| sampled in [M, max_shift] with random sign —
# guarantees motion energy at the coarse pyramid levels (a PWC-family
# requirement: its 81-bin integer-displacement correlation at /64 sees
# nothing below ~64 px). With min-shift set, frames are generated with a
# max_shift margin and center-cropped so the GT is exact EVERYWHERE (no
# reflected-border pixels with wrong flow).
min_shift = (float(argv[argv.index('--min-shift') + 1])
             if '--min-shift' in argv else 0.0)
if '--size' in argv:
    _si = argv.index('--size')
    SIZE = (int(argv[_si + 1]), int(argv[_si + 2]))
else:
    SIZE = (96, 128)
data = os.path.join(root, 'FlyingChairs_release', 'data')
maskd = os.path.join(root, 'mask', 'FlyingChairs_release', 'orb')
os.makedirs(data, exist_ok=True); os.makedirs(maskd, exist_ok=True)
rng = np.random.RandomState(0)


def rich_pair(h, w):
    """Textured frame + exact affine-warp second frame + dense GT flow.

    img2(x) = img1(S(x)) with S affine (cv2 WARP_INVERSE_MAP semantics), so
    the forward flow at pixel y is u(y) = S^-1(y) - y, exact everywhere the
    warp stays in-bounds (margins are still consistent: img1 is sampled with
    BORDER_REFLECT, and max |u| is kept small).
    """
    m = int(np.ceil(max_shift)) if (motion == 'shift' and min_shift > 0) else 0
    h, w = h + 2 * m, w + 2 * m
    base = rng.rand(h, w, 3).astype(np.float32)
    img1 = np.zeros_like(base)
    for sigma, gain in ((1.5, 1.0), (5.0, 2.0), (12.0, 4.0)):
        img1 += gain * cv2.GaussianBlur(base, (0, 0), sigma)
    img1 -= img1.min(); img1 *= 255.0 / max(img1.max(), 1e-6)
    # small random affine around the center: rotation + scale + shift
    # (--motion shift: translation only, but still subpixel + exact GT)
    if motion == 'shift':
        ang, scale = 0.0, 1.0
        t = rng.uniform(min_shift, max_shift, size=2) * rng.choice([-1.0, 1.0], size=2)
    else:
        ang = rng.uniform(-4, 4)
        scale = rng.uniform(0.96, 1.04)
        t = rng.uniform(-3, 3, size=2)
    S = cv2.getRotationMatrix2D((w / 2, h / 2), ang, scale)
    S[:, 2] += t
    img2 = cv2.warpAffine(img1, S, (w, h),
                          flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                          borderMode=cv2.BORDER_REFLECT)
    A, b = S[:, :2], S[:, 2]
    Ainv = np.linalg.inv(A)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([xs, ys], axis=-1)  # (h, w, 2) in (x, y)
    src = (pts - b) @ Ainv.T  # S^-1(y)
    flow = (src - pts).astype(np.float32)
    if m:  # center-crop the margin: every kept pixel's source is in-bounds
        img1 = img1[m:h - m, m:w - m]
        img2 = img2[m:h - m, m:w - m]
        flow = flow[m:h - m, m:w - m]
    return img1.astype(np.uint8), img2.astype(np.uint8), flow


ids = []
n_val = max(2, n // 8)
for i in range(1, n + 1):
    h, w = SIZE
    if rich:
        img1, img2, flow = rich_pair(h, w)
    else:
        img1 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # shift img2 by a known flow for a learnable signal
        dx, dy = rng.randint(-3, 4), rng.randint(-3, 4)
        img2 = np.roll(np.roll(img1, dy, 0), dx, 1)
        flow = np.zeros((h, w, 2), np.float32)
        flow[..., 0] = dx; flow[..., 1] = dy
    Image.fromarray(img1).save(f"{data}/{i:05d}_img1.ppm")
    Image.fromarray(img2).save(f"{data}/{i:05d}_img2.ppm")
    write_flo(f"{data}/{i:05d}_flow.flo", flow)
    m1 = ((rng.rand(h, w) > 0.97) * 255).astype(np.uint8)
    m2 = ((rng.rand(h, w) > 0.97) * 255).astype(np.uint8)
    cv2.imwrite(f"{maskd}/{i:05d}_img1.png", m1)
    cv2.imwrite(f"{maskd}/{i:05d}_img2.png", m2)
    ids.append(1 if i <= n - n_val else 2)  # last n_val pairs: validation
np.savetxt(os.path.join(root, 'FlyingChairs_release', 'FlyingChairs_train_val.txt'),
           np.array(ids, np.int32), fmt='%d')

# ---- tiny Sintel tree (dense; both render passes, one scene, 3 frames) ----
sh, sw = 104, 136
for dstype in ("clean", "final"):
    idir = os.path.join(root, 'Sintel-custom', 'training', dstype, 'alley_9')
    mdir = os.path.join(root, 'mask', 'Sintel-custom', 'orb', 'training',
                        dstype, 'alley_9')
    os.makedirs(idir, exist_ok=True); os.makedirs(mdir, exist_ok=True)
    frames = [(rng.rand(sh, sw, 3) * 255).astype(np.uint8) for _ in range(3)]
    for i, fr in enumerate(frames, start=1):
        Image.fromarray(fr).save(f"{idir}/frame_{i:04d}.png")
        m = ((rng.rand(sh, sw) > 0.97) * 255).astype(np.uint8)
        cv2.imwrite(f"{mdir}/frame_{i:04d}.png", m)
fdir = os.path.join(root, 'Sintel-custom', 'training', 'flow', 'alley_9')
os.makedirs(fdir, exist_ok=True)
for i in range(1, 3):
    fl = np.zeros((sh, sw, 2), np.float32)
    fl[..., 0], fl[..., 1] = rng.randint(-3, 4), rng.randint(-3, 4)
    write_flo(f"{fdir}/frame_{i:04d}.flo", fl)

# ---- tiny KITTI tree (sparse u16 flow, 2 pairs, KITTI-ish aspect) --------
kh, kw = 100, 160
kimg = os.path.join(root, 'KITTI-custom', 'training', 'image_2')
kflo = os.path.join(root, 'KITTI-custom', 'training', 'flow_occ')
kmask = os.path.join(root, 'mask', 'KITTI-custom', 'orb', 'training')
os.makedirs(kimg, exist_ok=True); os.makedirs(kflo, exist_ok=True)
os.makedirs(kmask, exist_ok=True)
for i in range(2):
    a = (rng.rand(kh, kw, 3) * 255).astype(np.uint8)
    b = np.roll(a, rng.randint(-3, 4), 1)
    cv2.imwrite(f"{kimg}/{i:06d}_10.png", a)
    cv2.imwrite(f"{kimg}/{i:06d}_11.png", b)
    fl = rng.randn(kh, kw, 2).astype(np.float32) * 3
    valid = rng.rand(kh, kw) < 0.25
    fl[~valid] = 0.0
    # sparse-valid u16 KITTI PNG (data/io.py::write_flow_kitti assumes
    # all-valid, so encode the valid channel directly here)
    uv = 64.0 * fl + 2**15
    out3 = np.concatenate([uv, valid[..., None].astype(np.float32)],
                          axis=-1).astype(np.uint16)
    cv2.imwrite(f"{kflo}/{i:06d}_10.png", out3[..., ::-1])
    for suf in ("10", "11"):
        m = ((rng.rand(kh, kw) > 0.97) * 255).astype(np.uint8)
        cv2.imwrite(f"{kmask}/{i:06d}_{suf}.png", m)
print("smoke data at", root)
