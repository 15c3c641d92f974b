"""Render the PSNR / point-count trajectory plot for the reference-scale
validation runs (VALIDATION_r02.md artifact).

Two panels, one axis each (never dual-axis): test PSNR over iterations and
alive-Gaussian count over iterations, one fixed-hue series per run
(blue/amber — CVD-safe pair), direct end labels, recessive grid.
"""

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RUNS = [
    ("baseline recipe (grad 2e-4)", "/root/repo/runs/refscale/history.json",
     "#3B82F6"),
    ("dense recipe (grad 1.3e-4, pd 0.03)",
     "/root/repo/runs/refscale_dense/history.json", "#F59E0B"),
]
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/validation_r02.png"

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4), dpi=140)
for ax in (ax1, ax2):
    ax.grid(True, color="#E5E7EB", linewidth=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.tick_params(colors="#6B7280", labelsize=8)

for name, path, color in RUNS:
    try:
        h = json.load(open(path))
    except FileNotFoundError:
        continue
    it_p = sorted((int(k), v) for k, v in h["psnr_test"].items())
    it_n = sorted((int(k), v) for k, v in h["n_alive"].items())
    ax1.plot([i for i, _ in it_p], [v for _, v in it_p], color=color,
             linewidth=2, marker="o", markersize=4)
    ax1.annotate(name, xy=it_p[-1], xytext=(4, 0),
                 textcoords="offset points", fontsize=8, color="#374151",
                 va="center")
    ax2.plot([i for i, _ in it_n], [v / 1000 for _, v in it_n], color=color,
             linewidth=2, marker="o", markersize=4)

ax1.set_title("test PSNR (dB)", fontsize=10, color="#111827", loc="left")
ax2.set_title("alive Gaussians (thousands)", fontsize=10, color="#111827",
              loc="left")
for ax in (ax1, ax2):
    ax.set_xlabel("iteration", fontsize=9, color="#6B7280")
fig.suptitle("Reference-scale synthetic validation (1237×822, 54K init, "
             "TPU v5e)", fontsize=11, x=0.01, ha="left", color="#111827")
fig.tight_layout(rect=(0, 0, 1, 0.94))
fig.savefig(OUT)
print("wrote", OUT)
