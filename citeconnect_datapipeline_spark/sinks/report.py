"""K7/K8: driver-side reporting sinks — plot images and email
alerts rendered from SMALL aggregates.

The reference renders matplotlib/seaborn PNGs of bias slices
(databias/visualization_generator.py:40-56,
slicing_bias_analysis.py:238-253) and mails SMTP HTML alerts with
inlined images (Validation/schema_validator.py:435-565,
dags/test_dag.py:383-432). Neither is an ENGINE operator — both are
driver-side actions on a collected aggregate — so they live here as
helpers with the same shape: bounded collect, deterministic render,
injected transport.

Scale stance: the ONLY distributed work is the aggregation that
produced the input DataFrame; these helpers refuse table-sized
inputs (same guard as ``write_json_artifact``) so a misuse fails
fast instead of OOMing the driver. Rendering is pure string/MIME
assembly: the default chart backend emits standalone SVG (no
matplotlib in this container — the ``renderer`` seam takes a
matplotlib-backed callable in production), and the mailer takes an
``smtp_factory`` (production: ``smtplib.SMTP``; tests: a recording
double) so no socket is opened unless the caller provides one.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable
from email.mime.image import MIMEImage
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any

from pyspark.sql import DataFrame

MAX_REPORT_ROWS = 1_000


def _esc(v) -> str:
    """XML-escape interpolated label/title text — category values
    like 'R&D' must not produce malformed SVG."""
    from html import escape

    return escape(str(v), quote=False)


def _collect_small(df: DataFrame, max_rows: int) -> list[dict]:
    rows = [
        r.asDict(recursive=True) for r in df.limit(max_rows + 1).collect()
    ]
    if len(rows) > max_rows:
        raise ValueError(
            f"report sink: input exceeds {max_rows} rows — these "
            "helpers render driver-sized aggregates, not tables"
        )
    return rows


def svg_bar_chart(
    rows: list[dict],
    x: str,
    y: str,
    title: str = "",
    width: int = 640,
    bar_h: int = 22,
) -> str:
    """Deterministic standalone-SVG horizontal bar chart — the
    dependency-free default renderer for ``plot_slices``. Pure
    string assembly: same rows, same bytes, any machine."""
    pad, gap, label_w = 8, 6, 160
    n = len(rows)
    height = pad * 2 + 24 + n * (bar_h + gap)
    vmax = max((abs(float(r[y] or 0)) for r in rows), default=0.0) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{pad}" y="{pad + 12}" font-weight="bold">'
        f"{_esc(title or y)}</text>",
    ]
    for i, r in enumerate(rows):
        v = float(r[y] or 0)
        top = pad + 24 + i * (bar_h + gap)
        w = int((width - label_w - pad * 2) * abs(v) / vmax)
        parts.append(
            f'<text x="{pad}" y="{top + bar_h - 7}">{_esc(r[x])}</text>'
            f'<rect x="{label_w}" y="{top}" width="{max(w, 1)}" '
            f'height="{bar_h}" fill="#4477aa"></rect>'
            f'<text x="{label_w + max(w, 1) + 4}" '
            f'y="{top + bar_h - 7}">{v:g}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def plot_slices(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    title: str = "",
    max_rows: int = MAX_REPORT_ROWS,
    renderer: Callable[[list[dict], str, str, str], str | bytes]
    | None = None,
) -> str:
    """K7: render a small aggregate (e.g. per-slice disparity means)
    to an image file. Default renderer writes standalone SVG;
    production injects a matplotlib-backed ``renderer`` returning
    PNG bytes (reference visualization_generator.py:40-56). Written
    atomically (tmp+rename) like every artifact sink. Returns the
    path."""
    rows = _collect_small(df, max_rows)
    if renderer is None:
        payload: str | bytes = svg_bar_chart(rows, x, y, title)
    else:
        payload = renderer(rows, x, y, title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp"
    mode = "wb" if isinstance(payload, bytes) else "w"
    with open(tmp, mode) as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def alert_email(
    stats: DataFrame | list[dict],
    subject: str,
    sender: str,
    recipients: Iterable[str],
    smtp_factory: Callable[[], Any],
    severity_col: str | None = None,
    inline_images: dict[str, bytes] | None = None,
    max_rows: int = MAX_REPORT_ROWS,
) -> dict:
    """K8: SMTP HTML alert for a small stats aggregate (reference
    schema_validator.py:435-565 — anomaly table + severity + inlined
    plot). Builds a multipart MIME message with an HTML table of the
    rows (worst severity first when ``severity_col`` is given) and
    optional inline images (cid-referenced), then sends through the
    injected ``smtp_factory`` — a context-manager factory like
    ``lambda: smtplib.SMTP(host)``; tests inject a recording double,
    so no socket opens here.

    Returns {recipients, n_rows, message_id} for the caller's audit
    log."""
    rows = (
        _collect_small(stats, max_rows)
        if isinstance(stats, DataFrame)
        else list(stats)
    )
    if severity_col:
        rows = sorted(
            rows, key=lambda r: r.get(severity_col) or 0, reverse=True
        )
    cols = list(rows[0].keys()) if rows else []
    cells = "".join(
        "<tr>" + "".join(f"<td>{r.get(c)}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    html = (
        f"<html><body><h3>{subject}</h3>"
        f"<table border='1'><tr>"
        + "".join(f"<th>{c}</th>" for c in cols)
        + f"</tr>{cells}</table>"
        + "".join(
            f'<img src="cid:{cid}"/>' for cid in (inline_images or {})
        )
        + "</body></html>"
    )
    msg = MIMEMultipart("related")
    msg["Subject"] = subject
    msg["From"] = sender
    to = list(recipients)
    msg["To"] = ", ".join(to)
    msg.attach(MIMEText(html, "html"))
    for cid, png in (inline_images or {}).items():
        try:
            img = MIMEImage(png)
        except TypeError:
            # undetectable payload (e.g. SVG text): label explicitly
            img = MIMEImage(png, _subtype="png")
        img.add_header("Content-ID", f"<{cid}>")
        msg.attach(img)
    with smtp_factory() as smtp:
        smtp.sendmail(sender, to, msg.as_string())
    return {
        "recipients": to,
        "n_rows": len(rows),
        "message_id": msg["Subject"],
    }


# ---------------------------------------------------------------------
# Bias-dashboard chart breadth (K7 continued): the remaining chart
# shapes the reference's dashboard renders (grouped comparisons,
# share-of-total pies, pivot heatmaps, trend lines —
# visualization_generator.py:58-414) as the same deterministic
# standalone-SVG string assembly as svg_bar_chart. Every renderer
# consumes an already-collected small aggregate; the distributed work
# stays in the groupBy/pivot that produced it.
# ---------------------------------------------------------------------

_PALETTE = (
    "#4477aa", "#ee6677", "#228833", "#ccbb44",
    "#66ccee", "#aa3377", "#bbbbbb",
)


def svg_pie_chart(
    rows: list[dict],
    label: str,
    value: str,
    title: str = "",
    size: int = 320,
) -> str:
    """Share-of-total pie with percent annotations (the reference's
    domain-distribution / extraction-method pies,
    visualization_generator.py:83,132 — autopct '%1.1f%%')."""
    import math

    total = sum(abs(float(r[value] or 0)) for r in rows) or 1.0
    cx = cy = size / 2.0
    rad = size / 2.0 - 10
    # canvas grows with the legend so >17 categories never clip
    height = max(size + 30, 30 + len(rows) * 18 + 10)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size + 220}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="8" y="16" font-weight="bold">'
        f"{_esc(title or value)}</text>",
    ]
    angle = -math.pi / 2  # 12 o'clock start, clockwise
    for i, r in enumerate(rows):
        v = abs(float(r[value] or 0))
        frac = v / total
        a0, a1 = angle, angle + 2 * math.pi * frac
        angle = a1
        x0 = round(cx + rad * math.cos(a0), 2)
        y0 = round(cy + 15 + rad * math.sin(a0), 2)
        x1 = round(cx + rad * math.cos(a1), 2)
        y1 = round(cy + 15 + rad * math.sin(a1), 2)
        large = 1 if frac > 0.5 else 0
        color = _PALETTE[i % len(_PALETTE)]
        if frac >= 0.999999:  # single-slice degenerate: full circle
            parts.append(
                f'<circle cx="{cx}" cy="{cy + 15}" r="{rad}" '
                f'fill="{color}"></circle>'
            )
        else:
            parts.append(
                f'<path d="M{cx},{cy + 15} L{x0},{y0} '
                f'A{rad},{rad} 0 {large} 1 {x1},{y1} Z" '
                f'fill="{color}"></path>'
            )
        # legend row with the reference's 1-dp percent label
        ly = 30 + i * 18
        parts.append(
            f'<rect x="{size + 10}" y="{ly}" width="12" height="12" '
            f'fill="{color}"></rect>'
            f'<text x="{size + 28}" y="{ly + 11}">'
            f"{_esc(r[label])} {frac * 100:.1f}%</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def svg_grouped_bar_chart(
    rows: list[dict],
    x: str,
    group: str,
    y: str,
    title: str = "",
    width: int = 720,
    height: int = 320,
) -> str:
    """Grouped vertical bars — category on the x axis, one colored
    bar per group value (the reference's side-by-side quality /
    mitigation comparisons, visualization_generator.py:141,336)."""
    cats = list(dict.fromkeys(r[x] for r in rows))
    groups = list(dict.fromkeys(r[group] for r in rows))
    vals = {(r[x], r[group]): float(r[y] or 0) for r in rows}
    vmax = max((abs(v) for v in vals.values()), default=0.0) or 1.0
    pad, legend_h = 8, 18 * len(groups)
    plot_h = height - 60
    cat_w = (width - pad * 2) / max(len(cats), 1)
    bar_w = max(cat_w * 0.8 / max(len(groups), 1), 2)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height + legend_h}" font-family="monospace" '
        f'font-size="12">',
        f'<text x="{pad}" y="16" font-weight="bold">'
        f"{_esc(title or y)}</text>",
    ]
    for ci, cat in enumerate(cats):
        x_left = pad + ci * cat_w
        for gi, g in enumerate(groups):
            v = vals.get((cat, g))
            if v is None:
                continue
            h = int(plot_h * abs(v) / vmax)
            top = 30 + plot_h - h
            parts.append(
                f'<rect x="{round(x_left + cat_w * 0.1 + gi * bar_w, 2)}" '
                f'y="{top}" width="{round(bar_w, 2)}" height="{max(h, 1)}" '
                f'fill="{_PALETTE[gi % len(_PALETTE)]}"></rect>'
            )
        parts.append(
            f'<text x="{round(x_left + cat_w * 0.1, 2)}" '
            f'y="{30 + plot_h + 14}">{_esc(cat)}</text>'
        )
    for gi, g in enumerate(groups):
        ly = height + gi * 18 - 10
        parts.append(
            f'<rect x="{pad}" y="{ly}" width="12" height="12" '
            f'fill="{_PALETTE[gi % len(_PALETTE)]}"></rect>'
            f'<text x="{pad + 18}" y="{ly + 11}">{_esc(g)}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _heat_color(frac: float) -> str:
    """Two-segment yellow->orange->red ramp (the reference heatmap's
    YlOrRd colormap, visualization_generator.py:407), deterministic
    integer interpolation."""
    stops = ((255, 255, 204), (254, 178, 76), (189, 0, 38))
    frac = min(max(frac, 0.0), 1.0)
    if frac <= 0.5:
        a, b, t = stops[0], stops[1], frac * 2
    else:
        a, b, t = stops[1], stops[2], (frac - 0.5) * 2
    rgb = tuple(round(ai + (bi - ai) * t) for ai, bi in zip(a, b))
    return f"#{rgb[0]:02x}{rgb[1]:02x}{rgb[2]:02x}"


def svg_heatmap(
    rows: list[dict],
    row_key: str,
    col_key: str,
    value: str,
    title: str = "",
    cell_w: int = 72,
    cell_h: int = 26,
) -> str:
    """Annotated pivot heatmap — (row x col) grid colored by value
    with the value printed in each cell (the reference's
    subdomain-by-domain mean-citation heatmap: pivot_table + seaborn
    annot='.1f', visualization_generator.py:385-414). Input is the
    LONG aggregate (one row per grid cell); the pivot to a grid
    happens here, driver-side, on the bounded rows."""
    rlabels = list(dict.fromkeys(r[row_key] for r in rows))
    clabels = list(dict.fromkeys(r[col_key] for r in rows))
    vals = {
        (r[row_key], r[col_key]): float(r[value] or 0) for r in rows
    }
    present = list(vals.values())
    vmin, vmax = (min(present), max(present)) if present else (0.0, 1.0)
    span = (vmax - vmin) or 1.0
    label_w, pad = 150, 8
    width = label_w + pad * 2 + cell_w * len(clabels)
    height = pad * 2 + 40 + cell_h * len(rlabels)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{pad}" y="16" font-weight="bold">'
        f"{_esc(title or value)}</text>",
    ]
    for ci, c in enumerate(clabels):
        parts.append(
            f'<text x="{label_w + ci * cell_w + 4}" y="36">'
            f"{_esc(c)}</text>"
        )
    for ri, rl in enumerate(rlabels):
        top = 42 + ri * cell_h
        parts.append(
            f'<text x="{pad}" y="{top + cell_h - 8}">'
            f"{_esc(rl)}</text>"
        )
        for ci, c in enumerate(clabels):
            v = vals.get((rl, c))
            left = label_w + ci * cell_w
            if v is None:
                parts.append(
                    f'<rect x="{left}" y="{top}" width="{cell_w - 2}" '
                    f'height="{cell_h - 2}" fill="#eeeeee"></rect>'
                )
                continue
            color = _heat_color((v - vmin) / span)
            parts.append(
                f'<rect x="{left}" y="{top}" width="{cell_w - 2}" '
                f'height="{cell_h - 2}" fill="{color}"></rect>'
                f'<text x="{left + 4}" y="{top + cell_h - 8}">'
                f"{v:.1f}</text>"
            )
    parts.append("</svg>")
    return "".join(parts)


def svg_line_chart(
    rows: list[dict],
    x: str,
    y: str,
    title: str = "",
    width: int = 720,
    height: int = 240,
) -> str:
    """Run-over-run trend polyline in input order (the reference's
    disparity-history trend, visualization_generator.py:280-333).
    X positions are equally spaced input ranks — the rows arrive
    pre-ordered from an ORDER BY, and run timestamps are
    categorical ticks there too."""
    pad = 8
    vals = [float(r[y] or 0) for r in rows]
    vmin, vmax = (min(vals), max(vals)) if vals else (0.0, 1.0)
    span = (vmax - vmin) or 1.0
    plot_w, plot_h = width - pad * 2, height - 70
    n = max(len(rows) - 1, 1)
    pts = []
    for i, v in enumerate(vals):
        px = round(pad + plot_w * i / n, 2)
        py = round(30 + plot_h * (1 - (v - vmin) / span), 2)
        pts.append((px, py))
    path = " ".join(f"{px},{py}" for px, py in pts)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{pad}" y="16" font-weight="bold">'
        f"{_esc(title or y)}</text>",
        f'<polyline points="{path}" fill="none" stroke="#4477aa" '
        f'stroke-width="2"></polyline>',
    ]
    for (px, py), r in zip(pts, rows):
        parts.append(
            f'<circle cx="{px}" cy="{py}" r="3" fill="#4477aa">'
            f"</circle>"
        )
    step = max(len(rows) // 8, 1)  # at most ~8 tick labels
    for i in range(0, len(rows), step):
        parts.append(
            f'<text x="{pts[i][0]}" y="{height - 28}">'
            f"{_esc(rows[i][x])}</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def box_violin_aggregate(
    df: DataFrame,
    category: str,
    value: str,
    bins: int = 16,
    top_k: int = 10,
) -> DataFrame:
    """Distributed prep for the box/violin chart: per category the
    five-number summary plus a fixed-bin density histogram — the
    BOUNDED aggregate (top_k rows, bins+2 ints each) the renderer
    consumes, standing in for the reference handing the full frame
    to df.boxplot/sns.violinplot (visualization_generator.py:103-117;
    it too keeps only the top-10 categories by count, :96-99).
    Shape at scale: one groupBy for the top-k pick + quantiles, one
    for the histogram (width_bucket over the GLOBAL value range so
    violins share an axis), both map-side combinable."""
    from pyspark.sql import functions as F

    # percentile_approx/min/max silently ignore value-nulls but
    # width_bucket(null) yields a null bin that map_from_entries
    # rejects as a map key — drop them up front so both branches see
    # the same (non-null) population. Category-nulls must go too:
    # groupBy keeps a null group (it can win a top_k slot) but the
    # semi/left joins below never match it, so its density would
    # come back null and crash the renderer (r11 ADVICE).
    df = df.filter(
        F.col(value).isNotNull() & F.col(category).isNotNull()
    )

    cats = (
        df.groupBy(category)
        .agg(
            F.count("*").alias("n"),
            F.expr(
                f"percentile_approx({value}, "
                "array(0.0, 0.25, 0.5, 0.75, 1.0), 10000)"
            ).alias("q"),
        )
        .orderBy(F.desc("n"), category)
        .limit(top_k)
    )
    rng = df.agg(
        F.min(value).alias("lo"), F.max(value).alias("hi")
    )
    hist = (
        df.join(F.broadcast(cats.select(category)), category, "semi")
        .crossJoin(F.broadcast(rng))
        .select(
            category,
            F.expr(
                f"width_bucket({value}, lo, hi + 1e-9, {bins})"
            ).alias("bin"),
        )
        .groupBy(category, "bin")
        .count()
        .groupBy(category)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bin", "count"))
            ).alias("density_map")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(1), F.lit(bins)),
        lambda b: F.coalesce(
            F.element_at("density_map", b.cast("int")), F.lit(0)
        ),
    )
    return (
        cats.join(hist, category, "left")
        .select(
            category,
            "n",
            F.col("q")[0].alias("lo"),
            F.col("q")[1].alias("q1"),
            F.col("q")[2].alias("med"),
            F.col("q")[3].alias("q3"),
            F.col("q")[4].alias("hi"),
            dense.alias("density"),
        )
        .orderBy(F.desc("n"), category)
    )


def svg_box_violin_chart(
    rows: list[dict],
    x: str,
    title: str = "",
    col_w: int = 84,
    height: int = 280,
) -> str:
    """Box + violin per category (the reference's citation_analysis
    panel: df.boxplot + sns.violinplot side-by-side,
    visualization_generator.py:103-117, fused into one mark per
    category). Each row carries the five-number summary
    (lo/q1/med/q3/hi) and a ``density`` bin-count list from
    ``box_violin_aggregate``; the violin is the mirrored density
    polygon, the box/whiskers/median draw on top of it."""
    pad = 8
    plot_top, plot_h = 30, height - 80
    his = [float(r["hi"] or 0) for r in rows]
    los = [float(r["lo"] or 0) for r in rows]
    vmin, vmax = (min(los), max(his)) if rows else (0.0, 1.0)
    span = (vmax - vmin) or 1.0

    def py(v: float) -> float:
        return round(plot_top + plot_h * (1 - (v - vmin) / span), 2)

    width = pad * 2 + col_w * max(len(rows), 1)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{pad}" y="16" font-weight="bold">'
        f"{_esc(title or x)}</text>",
    ]
    for i, r in enumerate(rows):
        cx = pad + col_w * i + col_w / 2
        density = [int(d or 0) for d in (r.get("density") or [])]
        # default=0 so a null/empty density row (defensive — the
        # aggregate filters null categories, but rows may come from
        # elsewhere) degrades to box-only instead of raising
        dmax = max(density, default=0) or 1
        nb = len(density)
        if nb:
            lo, hi = float(r["lo"] or 0), float(r["hi"] or 0)
            bh = (hi - lo) / nb if hi > lo else 0
            right = [
                (
                    round(cx + (col_w * 0.42) * d / dmax, 2),
                    py(lo + bh * (b + 0.5)),
                )
                for b, d in enumerate(density)
            ]
            ring = right + [(round(2 * cx - px, 2), y) for px, y in reversed(right)]
            path = " ".join(f"{px},{y}" for px, y in ring)
            parts.append(
                f'<polygon points="{path}" fill="#99ccee" '
                f'stroke="none" opacity="0.7"></polygon>'
            )
        q1, med, q3 = (float(r[k] or 0) for k in ("q1", "med", "q3"))
        lo, hi = float(r["lo"] or 0), float(r["hi"] or 0)
        bw = col_w * 0.3
        parts.append(
            f'<line x1="{cx}" y1="{py(lo)}" x2="{cx}" y2="{py(hi)}" '
            f'stroke="#333333" stroke-width="1"></line>'
            f'<rect x="{round(cx - bw / 2, 2)}" y="{py(q3)}" '
            f'width="{bw}" height="{max(round(py(q1) - py(q3), 2), 1)}" '
            f'fill="#4477aa" opacity="0.85"></rect>'
            f'<line x1="{round(cx - bw / 2, 2)}" y1="{py(med)}" '
            f'x2="{round(cx + bw / 2, 2)}" y2="{py(med)}" '
            f'stroke="#ffffff" stroke-width="2"></line>'
            f'<text x="{round(cx - col_w / 2 + 4, 2)}" '
            f'y="{height - 28}">{_esc(r[x])}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def svg_disparity_history_chart(
    rows: list[dict],
    x: str = "run_ts",
    ratio: str = "disparity_ratio",
    total: str = "total_papers",
    underrep: str = "underrep_subdomains",
    title: str = "Bias Disparity Ratio Trend Over Time",
    width: int = 720,
    height: int = 420,
) -> str:
    """The reference's two-panel disparity-history figure
    (visualization_generator.py:280-333): panel 1 the disparity
    ratio as a filled trend line, panel 2 the dual-axis collection
    progress (total papers vs underrepresented-subdomain count).
    Rows arrive ordered by run timestamp — the same shape the
    `run_over_run_anomaly` history table already produces."""
    pad = 8
    panel_h = (height - 90) // 2
    plot_w = width - pad * 2
    n = max(len(rows) - 1, 1)

    def series(col, top, ph):
        vals = [float(r[col] or 0) for r in rows]
        vmin, vmax = (min(vals), max(vals)) if vals else (0.0, 1.0)
        span = (vmax - vmin) or 1.0
        return [
            (
                round(pad + plot_w * i / n, 2),
                round(top + ph * (1 - (v - vmin) / span), 2),
            )
            for i, v in enumerate(vals)
        ]

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{pad}" y="16" font-weight="bold">{_esc(title)}'
        f"</text>",
    ]
    p1 = series(ratio, 30, panel_h)
    fill = (
        " ".join(f"{px},{y}" for px, y in p1)
        + f" {p1[-1][0]},{30 + panel_h} {p1[0][0]},{30 + panel_h}"
        if p1
        else ""
    )
    parts.append(
        f'<polygon points="{fill}" fill="#ee8866" opacity="0.3">'
        f"</polygon>"
        f'<polyline points="{" ".join(f"{px},{y}" for px, y in p1)}" '
        f'fill="none" stroke="#ee8866" stroke-width="2"></polyline>'
    )
    for px, y in p1:
        parts.append(
            f'<circle cx="{px}" cy="{y}" r="3" fill="#ee8866"></circle>'
        )
    top2 = 30 + panel_h + 30
    parts.append(
        f'<text x="{pad}" y="{top2 - 10}" font-weight="bold">'
        f"Collection Progress Over Time</text>"
    )
    for col, color in ((total, "#4477aa"), (underrep, "#cc3311")):
        pts = series(col, top2, panel_h)
        parts.append(
            f'<polyline points="{" ".join(f"{px},{y}" for px, y in pts)}" '
            f'fill="none" stroke="{color}" stroke-width="2">'
            f"</polyline>"
        )
    parts.append(
        f'<text x="{pad}" y="{height - 24}" fill="#4477aa">'
        f"{_esc(total)}</text>"
        f'<text x="{pad + 180}" y="{height - 24}" fill="#cc3311">'
        f"{_esc(underrep)}</text>"
    )
    step = max(len(rows) // 8, 1)
    for i in range(0, len(rows), step):
        parts.append(
            f'<text x="{round(pad + plot_w * i / n, 2)}" '
            f'y="{height - 8}">{_esc(rows[i][x])}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def mitigation_effectiveness_svg(report: dict) -> str | None:
    """The reference's mitigation-effectiveness summary panel
    (visualization_generator.py:336-382): a monospace text card
    rendered only when the mitigation report says success — callers
    get None (skip, like the reference's early returns) otherwise."""
    if report.get("status") != "success":
        return None
    papers = report.get("papers_collected", 0)
    all_terms = list(report.get("search_terms_used", []))
    terms = all_terms[:10]  # display cap only — the COUNT is the
    # full list (the reference prints len(search_terms), :368)
    lines = [
        "MITIGATION EFFECTIVENESS",
        "",
        f"Papers Collected: {papers}",
        f"Subdomains Targeted: {len(all_terms)}",
        "",
        "Targeted Subdomains:",
        *[f"  - {t}" for t in terms],
        "",
        "Status: Mitigation Completed",
    ]
    width, line_h = 560, 18
    height = 70 + line_h * len(lines)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="13">',
        f'<text x="12" y="22" font-weight="bold" font-size="16">'
        f"Mitigation Collection Summary</text>",
        f'<rect x="8" y="34" rx="8" width="{width - 16}" '
        f'height="{height - 42}" fill="#ccddaa" opacity="0.5">'
        f"</rect>",
    ]
    for i, line in enumerate(lines):
        parts.append(
            f'<text x="24" y="{58 + line_h * i}">{_esc(line)}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


_CHART_RENDERERS: dict[str, Callable[..., str]] = {
    "bar": svg_bar_chart,
    "pie": svg_pie_chart,
    "grouped_bar": svg_grouped_bar_chart,
    "heatmap": svg_heatmap,
    "line": svg_line_chart,
    "box_violin": svg_box_violin_chart,
    "disparity_history": svg_disparity_history_chart,
}


def plot_chart(
    df: DataFrame,
    path: str,
    kind: str,
    title: str = "",
    max_rows: int = MAX_REPORT_ROWS,
    **spec: str,
) -> str:
    """K7 dispatcher over the chart library: collect a bounded
    aggregate and render it as `kind` SVG to `path` (atomic write).
    Column roles are keyword spec per kind — bar/line: x,y; pie:
    label,value; grouped_bar: x,group,y; heatmap: row_key,col_key,
    value. The per-kind renderers are also injectable directly into
    ``plot_slices`` when a caller wants the renderer seam."""
    if kind not in _CHART_RENDERERS:
        raise ValueError(
            f"unknown chart kind {kind!r}; have "
            f"{sorted(_CHART_RENDERERS)}"
        )
    rows = _collect_small(df, max_rows)
    if title:
        spec["title"] = title  # empty -> let the renderer's own
        # default title stand (disparity_history ships one)
    payload = _CHART_RENDERERS[kind](rows, **spec)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path
