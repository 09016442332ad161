"""Interactive deformability scatter plot as a single self-contained HTML file.

Capability parity with reference ``examples/plot_scatter_example.py`` (and its
byte-identical copy ``training_data_prep.py``): loads every condition's
``gated_cell_metrics.csv`` (``:42-105``), plots x = ``convex_hull_area`` vs
y = ``deformability`` (``:201-202``) colored per condition, per-condition
2-D Gaussian-KDE density mapped to point alpha in [0.2, 0.8] (``:241-257``),
hover shows a base64 PNG crop of the cell (2x bbox expansion with the
coordinate swap, ``:107-171``), click-to-hide legend entries, and writes a
self-contained ``scatter_plot.html``.

Implementation is dependency-free in the browser (vanilla canvas JS) instead
of Bokeh, which is not available in this environment.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..utils.logger import setup_logger

logger = setup_logger(__name__)

PALETTE = [
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
    "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0", "#e45756",
]


def load_project_data(project_path: Path) -> pd.DataFrame:
    """Concatenate every condition's gated_cell_metrics.csv
    (reference ``:42-105``: conditions are subdirs; csv lives under the
    per-condition run dir)."""
    project_path = Path(project_path)
    frames = []
    for csv in sorted(project_path.rglob("gated_cell_metrics.csv")):
        df = pd.read_csv(csv)
        if "condition" not in df.columns:
            df["condition"] = csv.parent.name
        df["__csv_dir"] = str(csv.parent)
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no gated_cell_metrics.csv under {project_path}")
    df = pd.concat(frames, ignore_index=True)
    # global csv may duplicate per-condition csvs: drop exact duplicates
    df = df.drop_duplicates(subset=[c for c in df.columns if c != "__csv_dir"])
    return df


def find_original_image(csv_dir: Path, image_name: str) -> Optional[Path]:
    """Locate the run's saved original (reference ``:31-40``:
    ``1_original_images/{stem}_original.tiff``)."""
    stem = Path(image_name).stem
    for base in (csv_dir, csv_dir.parent):
        cand = base / "1_original_images" / f"{stem}_original.tiff"
        if cand.exists():
            return cand
    hits = list(csv_dir.parent.rglob(f"{stem}_original.tiff"))
    return hits[0] if hits else None


def crop_cell_base64(
    image_path: Path, row: pd.Series, max_size: int = 200
) -> Optional[str]:
    """Base64 PNG crop of one cell (2x bbox expansion; the metric bbox is in
    regionprops row/col order so min_x/max_x are rows — reference ``:107-171``)."""
    from PIL import Image

    from ..io.images import load_image

    try:
        img = load_image(image_path)
    except (OSError, ValueError):
        return None
    h, w = img.shape[:2]
    r0, r1 = int(row["min_x"]), int(row["max_x"])
    c0, c1 = int(row["min_y"]), int(row["max_y"])
    rh, rw_ = r1 - r0, c1 - c0
    r0 = max(0, r0 - rh // 2)
    r1 = min(h, r1 + rh // 2)
    c0 = max(0, c0 - rw_ // 2)
    c1 = min(w, c1 + rw_ // 2)
    if r1 <= r0 or c1 <= c0:
        return None
    crop = img[r0:r1, c0:c1]
    pil = Image.fromarray(crop)
    if max(pil.size) > max_size:
        pil.thumbnail((max_size, max_size))
    buf = io.BytesIO()
    pil.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def kde_alpha(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-point alpha from 2-D Gaussian KDE density, scaled to [0.2, 0.8]
    (reference ``:241-257``, LinAlgError fallback ``:294-317``)."""
    from scipy.stats import gaussian_kde

    if len(x) < 3:
        return np.full(len(x), 0.6)
    try:
        kde = gaussian_kde(np.vstack([x, y]))
        d = kde(np.vstack([x, y]))
        lo, hi = d.min(), d.max()
        if hi > lo:
            return 0.2 + 0.6 * (d - lo) / (hi - lo)
    except np.linalg.LinAlgError:
        pass
    return np.full(len(x), 0.6)


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Deformability scatter</title><style>
 body { font-family: sans-serif; margin: 1em; background: #fff; }
 #legend span { cursor: pointer; margin-right: 1em; user-select: none; }
 #legend .off { opacity: 0.3; text-decoration: line-through; }
 #tip { position: absolute; display: none; background: #fff; border: 1px solid #999;
        padding: 6px; font-size: 12px; pointer-events: none; box-shadow: 2px 2px 6px #0003; }
 #tip img { display: block; max-width: 200px; margin-top: 4px; }
</style></head><body>
<h2>Cell deformability vs convex hull area</h2>
<div id="legend"></div>
<canvas id="c" width="1000" height="640" style="border:1px solid #ccc"></canvas>
<div id="tip"></div>
<script>
const DATA = __DATA__;
const canvas = document.getElementById('c'), ctx = canvas.getContext('2d');
const tip = document.getElementById('tip');
const M = {l: 70, r: 20, t: 20, b: 50};
const hidden = new Set();
function extents() {
  let xs = [], ys = [];
  for (const d of DATA) if (!hidden.has(d.condition)) { xs.push(d.x); ys.push(d.y); }
  if (!xs.length) return [0, 1, 0, 1];
  const pad = a => { const lo = Math.min(...a), hi = Math.max(...a), p = (hi-lo)*0.05 || 1;
                     return [lo-p, hi+p]; };
  return [...pad(xs), ...pad(ys)];
}
let sx, sy, ex;
function draw() {
  ex = extents();
  const [x0, x1, y0, y1] = ex;
  sx = v => M.l + (v-x0)/(x1-x0) * (canvas.width-M.l-M.r);
  sy = v => canvas.height-M.b - (v-y0)/(y1-y0) * (canvas.height-M.t-M.b);
  ctx.clearRect(0,0,canvas.width,canvas.height);
  ctx.strokeStyle = '#999'; ctx.fillStyle = '#333'; ctx.font = '12px sans-serif';
  ctx.strokeRect(M.l, M.t, canvas.width-M.l-M.r, canvas.height-M.t-M.b);
  for (let i = 0; i <= 5; i++) {
    const xv = x0 + (x1-x0)*i/5, yv = y0 + (y1-y0)*i/5;
    ctx.fillText(xv.toFixed(0), sx(xv)-12, canvas.height-M.b+18);
    ctx.fillText(yv.toFixed(3), 8, sy(yv)+4);
  }
  ctx.fillText('convex_hull_area', canvas.width/2-40, canvas.height-12);
  ctx.save(); ctx.translate(14, canvas.height/2+40); ctx.rotate(-Math.PI/2);
  ctx.fillText('deformability', 0, 0); ctx.restore();
  for (const d of DATA) {
    if (hidden.has(d.condition)) continue;
    ctx.globalAlpha = d.a;
    ctx.fillStyle = d.color;
    ctx.beginPath(); ctx.arc(sx(d.x), sy(d.y), 4, 0, 6.3); ctx.fill();
  }
  ctx.globalAlpha = 1;
}
function legend() {
  const conds = [...new Set(DATA.map(d => d.condition))];
  const el = document.getElementById('legend');
  el.innerHTML = '';
  for (const c of conds) {
    const s = document.createElement('span');
    const color = DATA.find(d => d.condition === c).color;
    s.innerHTML = `<b style="color:${color}">&#9679;</b> ${c}`;
    s.onclick = () => { hidden.has(c) ? hidden.delete(c) : hidden.add(c);
                        s.classList.toggle('off'); draw(); };
    el.appendChild(s);
  }
}
canvas.addEventListener('mousemove', e => {
  const r = canvas.getBoundingClientRect();
  const mx = e.clientX - r.left, my = e.clientY - r.top;
  let best = null, bd = 100;
  for (const d of DATA) {
    if (hidden.has(d.condition)) continue;
    const dx = sx(d.x)-mx, dy = sy(d.y)-my, dist = dx*dx+dy*dy;
    if (dist < bd) { bd = dist; best = d; }
  }
  if (best) {
    tip.style.display = 'block';
    tip.style.left = (e.pageX+12) + 'px'; tip.style.top = (e.pageY+12) + 'px';
    tip.innerHTML = `<b>${best.condition}</b> ${best.image}<br>` +
      `hull_area=${best.x.toFixed(0)} deformability=${best.y.toFixed(4)}` +
      (best.img ? `<img src="data:image/png;base64,${best.img}">` : '');
  } else tip.style.display = 'none';
});
legend(); draw();
</script></body></html>"""


def create_scatter_plot(
    project_path: Path,
    output_path: Optional[Path] = None,
    max_points_per_condition: int = 2000,
    embed_images: bool = True,
) -> Path:
    """Build ``scatter_plot.html`` from a project's gated metrics."""
    project_path = Path(project_path)
    df = load_project_data(project_path)
    conditions = sorted(df["condition"].unique())
    points: List[Dict] = []
    for i, cond in enumerate(conditions):
        sub = df[df["condition"] == cond]
        if len(sub) > max_points_per_condition:
            sub = sub.sample(max_points_per_condition, random_state=0)
        alphas = kde_alpha(
            sub["convex_hull_area"].to_numpy(float),
            sub["deformability"].to_numpy(float),
        )
        for (_, row), a in zip(sub.iterrows(), alphas):
            img_b64 = None
            if embed_images and "image_name" in row:
                src = find_original_image(Path(row["__csv_dir"]), str(row["image_name"]))
                if src is not None:
                    img_b64 = crop_cell_base64(src, row)
            points.append(
                {
                    "condition": cond,
                    "x": float(row["convex_hull_area"]),
                    "y": float(row["deformability"]),
                    "a": float(a),
                    "color": PALETTE[i % len(PALETTE)],
                    "image": str(row.get("image_name", "")),
                    "img": img_b64,
                }
            )
    html = _HTML.replace("__DATA__", json.dumps(points))
    out = Path(output_path) if output_path else project_path / "scatter_plot.html"
    out.write_text(html)
    logger.info("Wrote %s (%d points, %d conditions)", out, len(points), len(conditions))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Interactive deformability scatter plot")
    p.add_argument("--project-path", type=Path, required=True,
                   help="run directory containing gated_cell_metrics.csv files")
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--no-images", action="store_true", help="skip hover image crops")
    args = p.parse_args(argv)
    create_scatter_plot(args.project_path, args.output, embed_images=not args.no_images)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
