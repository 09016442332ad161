"""Result viewer for manifest-stored results — static report or live server.

Replaces the reference's Streamlit+MinIO viewer
(reference ``tools/postgres_result_viewer.py``; streamlit is not installed
here): renders stored rows — boxes with confidence + deformability, decoded
masks as green overlays, and a metrics table. Masks decode via the shared
codec (``utils/mask_encoding``, the consumer contract at reference
``:101-108``).

Two modes:

* default — one self-contained static HTML report (``--output``).
* ``--serve PORT`` — a live stdlib-HTTP browser matching the reference
  viewer's DB-backed flow (``postgres_result_viewer.py:251-366``): a
  table picker at ``/``, paginated row lists at ``/t/<table>``, and
  per-row on-demand image fetch + render at ``/t/<table>/row?path=...``
  (images are fetched and drawn only when a row is opened, like the
  reference's MinIO on-demand fetch).

Backends: the sqlite manifest (``--manifest``) or Postgres
(``--postgres`` [+ ``--dbname``], import-gated like every DB adapter —
reference ``:427-722``); both expose the same row/results API.
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


def _row_page(manifest, table: str, path: str, fetcher) -> str:
    results = manifest.get_results(path) or []
    try:
        image = fetcher(path)
        b64 = render_row_image(image, results)
        img_html = f'<img src="data:image/png;base64,{b64}" style="max-width:700px">'
    except (OSError, ValueError, FileNotFoundError) as e:
        img_html = f"<em>image unavailable: {e}</em>"
    cells = "".join(
        "<tr>" + "".join(
            f"<td>{r.get(k, '') if not isinstance(r.get(k), dict) else '...'}</td>"
            for k in ("deformability", "area", "circularity", "ch_area",
                      "mean_brightness", "confidence")
        ) + "</tr>"
        for r in results
    )
    return f"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>{path}</title>
<style>body{{font-family:sans-serif;margin:2em}}</style></head><body>
<p><a href="/t/{table}">&larr; {table}</a></p><h2>{path}</h2>{img_html}
<table border=1 cellpadding=4><tr><th>deformability</th><th>area</th>
<th>circularity</th><th>ch_area</th><th>brightness</th><th>conf</th></tr>
{cells}</table></body></html>"""


def _table_page(manifest, table: str, limit: int) -> str:
    from urllib.parse import quote

    s = manifest.summary()
    items = "".join(
        f'<li><a href="/t/{table}/row?path={quote(r["minio_path"], safe="")}">'
        f'{r["minio_path"]}</a>'
        f'{" — error: " + str(r["error"]) if r["error"] else ""}'
        f'{"" if r["has_results"] else " (pending)"}</li>'
        for r in manifest.list_rows(limit=limit)
    )
    return f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{table}</title><style>body{{font-family:sans-serif;margin:2em}}</style>
</head><body><p><a href="/">&larr; tables</a></p><h1>{table}</h1>
<p>{s['completed']}/{s['total']} complete ({s['percent_complete']:.1f}%),
{s['errors']} errors, {s['empty']} empty.</p><ul>{items}</ul></body></html>"""


def serve_viewer(make_manifest, tables, host: str, port: int,
                 fetcher=None, max_rows: int = 200):
    """Live result browser (reference viewer's flow: table picker ->
    row list -> on-demand image render). ``make_manifest(table)`` builds a
    manifest adapter; ``tables`` lists selectable tables. Returns the
    configured HTTPServer (caller owns serve_forever — tests drive it in
    a thread)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, unquote, urlparse

    if fetcher is None:
        fetcher = _fs_fetch

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _html(self, code, body):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            try:
                if u.path in ("", "/"):
                    links = "".join(
                        f'<li><a href="/t/{t}">{t}</a></li>' for t in tables
                    )
                    return self._html(200, (
                        '<!DOCTYPE html><html><head><meta charset="utf-8">'
                        "<title>Result tables</title></head><body>"
                        f"<h1>Result tables</h1><ul>{links}</ul></body></html>"
                    ))
                parts = [s for s in u.path.split("/") if s]
                if len(parts) >= 2 and parts[0] == "t" and parts[1] in tables:
                    table = parts[1]
                    m = make_manifest(table)
                    try:
                        if len(parts) == 2:
                            return self._html(
                                200, _table_page(m, table, max_rows))
                        if len(parts) == 3 and parts[2] == "row":
                            path = unquote(
                                parse_qs(u.query).get("path", [""])[0])
                            return self._html(
                                200, _row_page(m, table, path, fetcher))
                    finally:
                        close = getattr(m, "close", None)
                        if close:
                            close()
                return self._html(404, "<h1>not found</h1>")
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("viewer request failed")
                return self._html(500, f"<h1>error</h1><pre>{e}</pre>")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Render stored results to HTML (static or --serve)")
    p.add_argument("--manifest", type=Path, default=None,
                   help="sqlite manifest path")
    p.add_argument("--postgres", action="store_true",
                   help="read from Postgres (PG* env / --dbname) instead of "
                        "the sqlite manifest — the reference viewer's "
                        "DB-backed flow")
    p.add_argument("--dbname", type=str, default=None)
    p.add_argument("--table", type=str, default="images")
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--max-rows", type=int, default=20)
    p.add_argument("--serve", type=int, default=None, metavar="PORT",
                   help="live browser: table picker + on-demand row render")
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    if args.postgres:
        from ..registry.postgres import PostgresManifest

        def make_manifest(table):
            return PostgresManifest(table=table, dbname=args.dbname)
    elif args.manifest is not None:
        def make_manifest(table):
            return WorkManifest(args.manifest, table=table)
    else:
        p.error("one of --manifest or --postgres is required")

    if args.serve is not None:
        m = make_manifest(args.table)
        tables = (m.list_tables() if hasattr(m, "list_tables")
                  else [args.table])
        close = getattr(m, "close", None)
        if close:
            close()
        server = serve_viewer(make_manifest, tables, args.host, args.serve)
        print(f"result viewer on {args.host}:{server.server_address[1]}")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    if args.output is None:
        p.error("--output is required without --serve")
    build_report(make_manifest(args.table), args.output, args.max_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
