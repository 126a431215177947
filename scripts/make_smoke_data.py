"""Build a synthetic FlyingChairs-layout dataset for e2e smoke runs."""
import os, sys
import numpy as np
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from focusflow_official_tpu.data.io import write_flo
from PIL import Image
import cv2

root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ff_smoke'
data = os.path.join(root, 'FlyingChairs_release', 'data')
maskd = os.path.join(root, 'mask', 'FlyingChairs_release', 'orb')
os.makedirs(data, exist_ok=True); os.makedirs(maskd, exist_ok=True)
rng = np.random.RandomState(0)
n = 8
ids = []
for i in range(1, n + 1):
    h, w = 96, 128
    img1 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    # shift img2 by a known flow for a learnable signal
    dx, dy = rng.randint(-3, 4), rng.randint(-3, 4)
    img2 = np.roll(np.roll(img1, dy, 0), dx, 1)
    flow = np.zeros((h, w, 2), np.float32); flow[..., 0] = dx; flow[..., 1] = dy
    Image.fromarray(img1).save(f"{data}/{i:05d}_img1.ppm")
    Image.fromarray(img2).save(f"{data}/{i:05d}_img2.ppm")
    write_flo(f"{data}/{i:05d}_flow.flo", flow)
    m1 = ((rng.rand(h, w) > 0.97) * 255).astype(np.uint8)
    m2 = ((rng.rand(h, w) > 0.97) * 255).astype(np.uint8)
    cv2.imwrite(f"{maskd}/{i:05d}_img1.png", m1)
    cv2.imwrite(f"{maskd}/{i:05d}_img2.png", m2)
    ids.append(1 if i <= 6 else 2)  # 6 train, 2 validation
np.savetxt(os.path.join(root, 'FlyingChairs_release', 'FlyingChairs_train_val.txt'),
           np.array(ids, np.int32), fmt='%d')
print("smoke data at", root)
