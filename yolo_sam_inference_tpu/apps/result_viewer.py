"""Static HTML result viewer for manifest-stored results.

Replaces the reference's Streamlit+MinIO viewer
(reference ``tools/postgres_result_viewer.py``; streamlit is not installed
here): renders stored rows — boxes with confidence + deformability, decoded
masks as green overlays, and a metrics table — into one self-contained HTML
report. Masks decode via the shared codec (``utils/mask_encoding``,
the consumer contract at reference ``:101-108``).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..registry.manifest import WorkManifest
from ..utils.logger import setup_logger
from ..utils.mask_encoding import decode_binary_mask

logger = setup_logger(__name__)


def render_row_image(image: np.ndarray, results: List[Dict[str, Any]]) -> str:
    """Draw boxes + green mask overlay; return base64 PNG."""
    from PIL import Image, ImageDraw

    img = image.copy()
    overlay = img.astype(np.float32)
    for r in results:
        if "mask" in r and r["mask"]:
            try:
                mask = decode_binary_mask(r["mask"])
                if mask.shape == img.shape[:2]:
                    overlay[mask] = overlay[mask] * 0.5 + np.asarray([0, 255, 0]) * 0.5
            except (ValueError, KeyError):
                pass
    pil = Image.fromarray(overlay.astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for r in results:
        box = r.get("box")
        if box:
            draw.rectangle(
                [box["x_min"], box["y_min"], box["x_max"], box["y_max"]],
                outline=(255, 0, 0),
            )
            label = []
            if "confidence" in r:
                label.append(f"c={r['confidence']:.2f}")
            if "deformability" in r and r["deformability"] is not None:
                label.append(f"d={r['deformability']:.3f}")
            if label:
                draw.text((box["x_min"], max(0, box["y_min"] - 10)), " ".join(label),
                          fill=(255, 255, 0))
    buf = io.BytesIO()
    pil.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def build_report(
    manifest: WorkManifest,
    output_path: Path,
    max_rows: int = 20,
    fetcher=None,
) -> Path:
    """Render up to ``max_rows`` completed manifest rows into an HTML report."""
    if fetcher is None:
        from .result_viewer import _fs_fetch as fetcher  # noqa: PLW0127

    rows = [r for r in manifest.list_rows(limit=10000) if r["has_results"]][:max_rows]
    sections = []
    for row in rows:
        results = manifest.get_results(row["minio_path"]) or []
        img_html = ""
        try:
            image = fetcher(row["minio_path"])
            b64 = render_row_image(image, results)
            img_html = f'<img src="data:image/png;base64,{b64}" style="max-width:600px">'
        except (OSError, ValueError, FileNotFoundError) as e:
            img_html = f"<em>image unavailable: {e}</em>"
        table = "".join(
            "<tr>" + "".join(
                f"<td>{r.get(k, '')if not isinstance(r.get(k), dict) else '...'}</td>"
                for k in ("deformability", "area", "circularity", "ch_area",
                          "mean_brightness", "confidence")
            ) + "</tr>"
            for r in results
        )
        sections.append(f"""
<section><h3>{row['minio_path']}</h3>{img_html}
<table border=1 cellpadding=4><tr><th>deformability</th><th>area</th>
<th>circularity</th><th>ch_area</th><th>brightness</th><th>conf</th></tr>
{table}</table></section>""")
    summary = manifest.summary()
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>Results: {summary['table']}</title>
<style>body{{font-family:sans-serif;margin:2em}} section{{margin-bottom:2em}}</style>
</head><body><h1>Result viewer — {summary['table']}</h1>
<p>{summary['completed']}/{summary['total']} complete
({summary['percent_complete']:.1f}%), {summary['errors']} errors,
{summary['empty']} empty.</p>
{''.join(sections)}</body></html>"""
    output_path = Path(output_path)
    output_path.write_text(html)
    logger.info("wrote %s (%d rows)", output_path, len(rows))
    return output_path


def _fs_fetch(path: str) -> np.ndarray:
    from ..io.images import load_image

    return load_image(path)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Render stored results to HTML")
    p.add_argument("--manifest", type=Path, required=True, help="sqlite manifest path")
    p.add_argument("--table", type=str, default="images")
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--max-rows", type=int, default=20)
    args = p.parse_args(argv)
    manifest = WorkManifest(args.manifest, table=args.table)
    build_report(manifest, args.output, args.max_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
