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
        f"{title or y}</text>",
    ]
    for i, r in enumerate(rows):
        v = float(r[y] or 0)
        top = pad + 24 + i * (bar_h + gap)
        w = int((width - label_w - pad * 2) * abs(v) / vmax)
        parts.append(
            f'<text x="{pad}" y="{top + bar_h - 7}">{r[x]}</text>'
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
