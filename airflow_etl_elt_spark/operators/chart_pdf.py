"""Chart sink: render per-group KDE curves to a real PDF, zero dependencies.

Closes SURVEY §2 row 8's remaining boundary (the reference's
``plot_kde`` — dags/include/utils.py:255-318 — saves a matplotlib figure;
matplotlib is not in this sandbox). Instead of stubbing, this writes the
PDF directly: the format's vector core is small — a page object, a content
stream of path/text operators, the standard built-in Helvetica font (no
embedding needed for the base-14 fonts), and an xref table. Public spec
(ISO 32000 / the classic PDF 1.4 reference); ~150 lines.

Spark-side contract: the DRAWING input is the bounded ``kde_per_group``
output (groups × grid_points rows — chart-sized by construction, the one
collect a chart sink is allowed), so the distributed part of the chart
pipeline is exactly the oracle-checked KDE operator; this module only
turns those rows into bytes. Deterministic: same rows → identical PDF
bytes (stable ordering, fixed float formatting), so the artifact itself is
diffable in tests.
"""

from __future__ import annotations

import os
import zlib

from pyspark.sql import DataFrame

#: distinct, color-blind-aware line colors (Okabe-Ito, public domain)
PALETTE = [
    (0.00, 0.45, 0.70),  # blue
    (0.90, 0.62, 0.00),  # orange
    (0.00, 0.62, 0.45),  # bluish green
    (0.80, 0.47, 0.65),  # reddish purple
    (0.35, 0.70, 0.90),  # sky blue
    (0.84, 0.37, 0.00),  # vermillion
    (0.94, 0.89, 0.26),  # yellow
    (0.00, 0.00, 0.00),  # black
]

_W, _H = 576.0, 288.0  # 8in x 4in at 72 pt/in, the reference's figsize
_ML, _MR, _MT, _MB = 54.0, 18.0, 36.0, 40.0  # plot-box margins


def _esc(s: str) -> str:
    # base-14 Helvetica strings are Latin-1; replace anything outside it
    # rather than crash on an exotic group label
    s = s.encode("latin-1", "replace").decode("latin-1")
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


def _content_stream(series: "list[tuple[str, list[tuple[float, float]]]]",
                    title: str, xlabel: str, n_total: int) -> bytes:
    xs = [x for _, pts in series for x, _ in pts]
    ys = [y for _, pts in series for _, y in pts]
    # Empty input (kde_per_group over an empty frame) renders an axes-only
    # chart instead of crashing on min()/max() of an empty sequence
    # (ADVICE r5) — a pipeline run over zero rows should still produce its
    # artifact, the way the reference's matplotlib call would.
    x0, x1 = (min(xs), max(xs)) if xs else (0.0, 1.0)
    y1 = (max(ys) if ys else 0.0) or 1.0
    if x1 == x0:
        x1 = x0 + 1.0
    px0, px1 = _ML, _W - _MR
    py0, py1 = _MB, _H - _MT

    def X(x: float) -> float:
        return px0 + (x - x0) / (x1 - x0) * (px1 - px0)

    def Y(y: float) -> float:
        return py0 + y / (y1 * 1.05) * (py1 - py0)

    ops: list[str] = []
    # plot box + light grid
    ops.append("0.8 0.8 0.8 RG 0.5 w")
    for i in range(1, 5):
        gy = py0 + i * (py1 - py0) / 5
        ops.append(f"{_fmt(px0)} {_fmt(gy)} m {_fmt(px1)} {_fmt(gy)} l S")
    ops.append("0 0 0 RG 1 w")
    ops.append(
        f"{_fmt(px0)} {_fmt(py0)} m {_fmt(px1)} {_fmt(py0)} l S"
    )
    ops.append(
        f"{_fmt(px0)} {_fmt(py0)} m {_fmt(px0)} {_fmt(py1)} l S"
    )
    # curves
    for i, (_, pts) in enumerate(series):
        r, g, b = PALETTE[i % len(PALETTE)]
        ops.append(f"{r:.2f} {g:.2f} {b:.2f} RG 1.2 w")
        path = [
            f"{_fmt(X(x))} {_fmt(Y(y))} {'m' if j == 0 else 'l'}"
            for j, (x, y) in enumerate(pts)
        ]
        ops.append(" ".join(path) + " S")
    # x-axis tick labels (min / mid / max)
    ops.append("0 0 0 rg")
    for frac, val in ((0.0, x0), (0.5, (x0 + x1) / 2), (1.0, x1)):
        tx = px0 + frac * (px1 - px0) - 10
        ops.append(f"BT /F1 8 Tf {_fmt(tx)} {_fmt(py0 - 12)} Td ({_esc(_fmt(val))}) Tj ET")
    # title, xlabel, sample note
    ops.append(f"BT /F1 14 Tf {_fmt(px0)} {_fmt(_H - 24)} Td ({_esc(title)}) Tj ET")
    ops.append(
        f"BT /F1 9 Tf {_fmt((px0 + px1) / 2 - 20)} {_fmt(py0 - 26)} Td ({_esc(xlabel)}) Tj ET"
    )
    ops.append(
        f"BT /F1 8 Tf {_fmt(px1 - 110)} {_fmt(py1 + 4)} Td (Total {n_total} samples) Tj ET"
    )
    # legend: swatch + label per series, top-left inside the box
    ly = py1 - 14
    for i, (name, _) in enumerate(series):
        r, g, b = PALETTE[i % len(PALETTE)]
        ops.append(f"{r:.2f} {g:.2f} {b:.2f} RG 2 w")
        ops.append(f"{_fmt(px0 + 8)} {_fmt(ly + 3)} m {_fmt(px0 + 24)} {_fmt(ly + 3)} l S")
        ops.append(f"BT /F1 9 Tf {_fmt(px0 + 28)} {_fmt(ly)} Td ({_esc(name)}) Tj ET")
        ly -= 12
    return "\n".join(ops).encode("latin-1")


def write_pdf(path: str, content: bytes) -> None:
    """Assemble a single-page PDF 1.4 around a finished content stream."""
    stream = zlib.compress(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 576 288] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def plot_kde_pdf(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_dir: str,
    title: str = "KDE",
    grid_points: int = 64,
) -> str:
    """The reference's chart sink end-to-end: distributed per-group KDE
    (operators/stats.kde_per_group — the oracle-checked part), bounded
    collect of the grid, vector-PDF render. Returns the written file path
    (``<out_dir>/<title-slug>.pdf``, mirroring utils.py:310)."""
    from airflow_etl_elt_spark.operators.stats import kde_per_group

    rows = kde_per_group(df, group_col, value_col, grid_points).collect()
    n_total = df.count()
    by_group: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        by_group.setdefault(r["group_key"], []).append((r["x"], r["density"]))
    # reference sorts classes descending (utils.py:264)
    series = [
        (k, sorted(pts)) for k, pts in sorted(by_group.items(), reverse=True)
    ]
    content = _content_stream(series, title, value_col, n_total)
    file_path = os.path.join(out_dir, f"{title.lower().replace(' ', '_')}.pdf")
    write_pdf(file_path, content)
    return file_path
