#!/usr/bin/env python
"""Educational demo: numerically-stable ONLINE softmax (the flash-attention
rescaling trick used by every attention kernel in this repo).

Analog of the reference's `math/softmax.py` teaching script, minus
matplotlib (terminal output only), plus the streaming formulation.

  python examples/online_softmax.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

np.random.seed(0)
x = np.random.randn(12) * 5

print("=== Softmax stability ===")
naive = np.exp(x) / np.exp(x).sum()
stable = np.exp(x - x.max()) / np.exp(x - x.max()).sum()
print(f"max |naive - stable| = {np.abs(naive - stable).max():.2e} "
      f"(same values; stability matters once x ~ 100)")

big = x + 800
try:
    bad = np.exp(big) / np.exp(big).sum()
    print(f"naive at x~800: {bad[:3]} (overflow -> nan)")
except FloatingPointError:
    pass
good = np.exp(big - big.max()) / np.exp(big - big.max()).sum()
print(f"stable at x~800: finite, sums to {good.sum():.6f}")

print("\n=== Online (streaming) softmax ===")
print("process x in chunks, never holding all scores at once:\n")
m, l, acc = -np.inf, 0.0, 0.0
values = np.random.randn(12)  # 'V' rows to weight
for i, chunk in enumerate(np.split(x, 4)):
    vchunk = np.split(values, 4)[i]
    m_new = max(m, chunk.max())
    alpha = np.exp(m - m_new)          # rescale history
    p = np.exp(chunk - m_new)
    l = l * alpha + p.sum()
    acc = acc * alpha + (p * vchunk).sum()
    m = m_new
    print(f"  chunk {i}: running max {m:+.3f}, denom {l:.4f}")

direct = (np.exp(x - x.max()) / np.exp(x - x.max()).sum() * values).sum()
print(f"\nonline result  {acc / l:+.6f}")
print(f"direct result  {direct:+.6f}")
print("\nThis identity is why the decode kernel can stream KV pages from"
      "\nHBM one chunk at a time with O(1) extra memory.")
