"""Report-figure generation — artifact parity with the reference's
tools/generate_report_figures.py:14-154, which renders six PNGs from
test_predictions.csv with pandas+seaborn. This engine re-expresses the
figure DATA as Spark aggregations (the reference loads the full
prediction set into driver pandas — at 100 TB the driver dies first)
and renders dependency-free SVG (this container has no matplotlib;
SVG is plain text, diffable, and converts to PNG with any rasterizer).

Figures (same six, same semantics):
  confusion_matrix_counts.svg       crosstab(actual, predicted)
  confusion_matrix_normalized.svg   row-normalized crosstab
  label_distribution.svg            actual_label counts
  pred_vs_actual.svg                scatter (deterministic hash sample,
                                    driver sees <= max_points rows) +
                                    MAE/RMSE in the title
  residuals_hist.svg                30-bin residual histogram with
                                    mean/median markers
  mean_by_timewindow.svg            mean actual vs predicted per
                                    DepTime_TOD (figure E)

Scale shape: every figure is a small-group aggregate (<= bins x 2
cells) computed with DataFrame ops; only those tiny frames and one
bounded sample ever reach the driver.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Fixed label order (functions/labels.delay_label outputs).
LABELS = ["early", "on time", "delayed"]

_W, _H, _PAD = 640, 420, 56
_FG, _GRID = "#222", "#ccc"
_SERIES = ["#4878a8", "#e0883a"]  # actual / predicted


def _esc(s: object) -> str:
    return html.escape(str(s), quote=True)


def _svg(body: list[str], title: str, w: int = _W, h: int = _H) -> str:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}" font-family="sans-serif" font-size="12">'
        f'<rect width="{w}" height="{h}" fill="white"/>'
        f'<text x="{w / 2}" y="20" text-anchor="middle" font-size="15" '
        f'fill="{_FG}">{_esc(title)}</text>'
    )
    return head + "".join(body) + "</svg>"


def _lin(v: float, lo: float, hi: float, p0: float, p1: float) -> float:
    span = (hi - lo) or 1.0
    return p0 + (v - lo) / span * (p1 - p0)


def _axis_labels(lo: float, hi: float, n: int = 5) -> list[float]:
    return [lo + (hi - lo) * i / (n - 1) for i in range(n)]


def _heatmap_svg(
    title: str, matrix: list[list[float]], fmt: str, vmax: float
) -> str:
    """3x3 label-confusion heatmap: blue depth encodes the cell value,
    every cell annotated (the seaborn annot=True equivalent)."""
    n = len(LABELS)
    cell = 90
    x0, y0 = _PAD + 40, 48
    body = []
    for i, actual in enumerate(LABELS):
        for j, pred in enumerate(LABELS):
            v = matrix[i][j]
            frac = 0.0 if vmax <= 0 else min(v / vmax, 1.0)
            # white -> steel-blue ramp
            r, g, b = (
                int(255 - 183 * frac),
                int(255 - 135 * frac),
                int(255 - 87 * frac),
            )
            body.append(
                f'<rect x="{x0 + j * cell}" y="{y0 + i * cell}" width="{cell}" '
                f'height="{cell}" fill="rgb({r},{g},{b})" stroke="{_GRID}"/>'
            )
            tcol = "white" if frac > 0.6 else _FG
            body.append(
                f'<text x="{x0 + j * cell + cell / 2}" y="{y0 + i * cell + cell / 2 + 4}" '
                f'text-anchor="middle" fill="{tcol}">{fmt % v}</text>'
            )
        body.append(
            f'<text x="{x0 - 8}" y="{y0 + i * cell + cell / 2 + 4}" '
            f'text-anchor="end" fill="{_FG}">{_esc(actual)}</text>'
        )
    for j, pred in enumerate(LABELS):
        body.append(
            f'<text x="{x0 + j * cell + cell / 2}" y="{y0 + n * cell + 18}" '
            f'text-anchor="middle" fill="{_FG}">{_esc(pred)}</text>'
        )
    body.append(
        f'<text x="{x0 - 44}" y="{y0 + n * cell / 2}" fill="{_FG}" text-anchor="middle" '
        f'transform="rotate(-90 {x0 - 44} {y0 + n * cell / 2})">Actual</text>'
    )
    body.append(
        f'<text x="{x0 + n * cell / 2}" y="{y0 + n * cell + 38}" '
        f'text-anchor="middle" fill="{_FG}">Predicted</text>'
    )
    return _svg(body, title, w=max(_W, x0 + n * cell + 40), h=y0 + n * cell + 50)


def _bars_svg(title: str, pairs: list[tuple[str, float]], color: str = _SERIES[0]) -> str:
    if not pairs:
        return _svg([], title)
    vmax = max(v for _, v in pairs) or 1.0
    x0, x1, y0, y1 = _PAD, _W - 20, _H - _PAD, 40
    bw = (x1 - x0) / len(pairs) * 0.7
    body = [f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="{_FG}"/>']
    for i, (name, v) in enumerate(pairs):
        cx = _lin(i + 0.5, 0, len(pairs), x0, x1)
        top = _lin(v, 0, vmax, y0, y1)
        body.append(
            f'<rect x="{cx - bw / 2:.1f}" y="{top:.1f}" width="{bw:.1f}" '
            f'height="{y0 - top:.1f}" fill="{color}"/>'
        )
        body.append(
            f'<text x="{cx:.1f}" y="{top - 5:.1f}" text-anchor="middle" '
            f'fill="{_FG}">{v:g}</text>'
        )
        body.append(
            f'<text x="{cx:.1f}" y="{y0 + 16}" text-anchor="middle" '
            f'fill="{_FG}">{_esc(name)}</text>'
        )
    return _svg(body, title)


def _hist_svg(
    title: str, edges: list[float], counts: list[int], mean: float, median: float
) -> str:
    vmax = max(counts) or 1
    x0, x1, y0, y1 = _PAD, _W - 20, _H - _PAD, 40
    lo, hi = edges[0], edges[-1]
    body = [f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="{_FG}"/>']
    for i, c in enumerate(counts):
        bx0 = _lin(edges[i], lo, hi, x0, x1)
        bx1 = _lin(edges[i + 1], lo, hi, x0, x1)
        top = _lin(c, 0, vmax, y0, y1)
        body.append(
            f'<rect x="{bx0:.1f}" y="{top:.1f}" width="{bx1 - bx0:.1f}" '
            f'height="{y0 - top:.1f}" fill="{_SERIES[0]}" stroke="white" stroke-width="0.5"/>'
        )
    for v, color, dash, name in (
        (mean, "#c03030", "6,3", f"mean={mean:.2f}"),
        (median, "#d2801e", "2,3", f"median={median:.2f}"),
    ):
        px = _lin(v, lo, hi, x0, x1)
        body.append(
            f'<line x1="{px:.1f}" y1="{y0}" x2="{px:.1f}" y2="{y1}" '
            f'stroke="{color}" stroke-dasharray="{dash}"/>'
        )
        body.append(
            f'<text x="{px + 4:.1f}" y="{y1 + 12}" fill="{color}">{_esc(name)}</text>'
        )
    for t in _axis_labels(lo, hi):
        px = _lin(t, lo, hi, x0, x1)
        body.append(
            f'<text x="{px:.1f}" y="{y0 + 16}" text-anchor="middle" fill="{_FG}">{t:.0f}</text>'
        )
    return _svg(body, title)


def _scatter_svg(
    title: str, points: list[tuple[float, float]], lo: float, hi: float
) -> str:
    x0, x1, y0, y1 = _PAD, _W - 20, _H - _PAD, 40
    body = [
        f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="{_FG}"/>',
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="{_FG}"/>',
        # y=x reference diagonal
        f'<line x1="{_lin(lo, lo, hi, x0, x1):.1f}" y1="{_lin(lo, lo, hi, y0, y1):.1f}" '
        f'x2="{_lin(hi, lo, hi, x0, x1):.1f}" y2="{_lin(hi, lo, hi, y0, y1):.1f}" '
        f'stroke="#c03030" stroke-dasharray="5,4"/>',
    ]
    for ax, pred in points:
        body.append(
            f'<circle cx="{_lin(ax, lo, hi, x0, x1):.1f}" '
            f'cy="{_lin(pred, lo, hi, y0, y1):.1f}" r="2" '
            f'fill="{_SERIES[0]}" fill-opacity="0.45"/>'
        )
    for t in _axis_labels(lo, hi):
        body.append(
            f'<text x="{_lin(t, lo, hi, x0, x1):.1f}" y="{y0 + 16}" '
            f'text-anchor="middle" fill="{_FG}">{t:.0f}</text>'
        )
        body.append(
            f'<text x="{x0 - 6}" y="{_lin(t, lo, hi, y0, y1) + 4:.1f}" '
            f'text-anchor="end" fill="{_FG}">{t:.0f}</text>'
        )
    body.append(
        f'<text x="{(x0 + x1) / 2}" y="{y0 + 34}" text-anchor="middle" fill="{_FG}">Actual</text>'
    )
    body.append(
        f'<text x="{x0 - 40}" y="{(y0 + y1) / 2}" fill="{_FG}" text-anchor="middle" '
        f'transform="rotate(-90 {x0 - 40} {(y0 + y1) / 2})">Predicted</text>'
    )
    return _svg(body, title)


def _lines_svg(title: str, names: list[str], series: dict[str, list[float]]) -> str:
    flat = [v for vs in series.values() for v in vs]
    if not flat:
        return _svg([], title)
    lo, hi = min(flat + [0.0]), max(flat)
    x0, x1, y0, y1 = _PAD, _W - 20, _H - _PAD, 40
    body = [f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="{_FG}"/>']
    for si, (label, vals) in enumerate(series.items()):
        color = _SERIES[si % len(_SERIES)]
        pts = [
            (
                _lin(i + 0.5, 0, len(names), x0, x1),
                _lin(v, lo, hi, y0, y1),
            )
            for i, v in enumerate(vals)
        ]
        path = " ".join(f"{'M' if i == 0 else 'L'}{px:.1f},{py:.1f}" for i, (px, py) in enumerate(pts))
        body.append(f'<path d="{path}" fill="none" stroke="{color}" stroke-width="2"/>')
        for px, py in pts:
            body.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="3" fill="{color}"/>')
        body.append(
            f'<text x="{x1 - 100}" y="{y1 + 16 * si}" fill="{color}">{_esc(label)}</text>'
        )
    for i, name in enumerate(names):
        body.append(
            f'<text x="{_lin(i + 0.5, 0, len(names), x0, x1):.1f}" y="{y0 + 16}" '
            f'text-anchor="middle" fill="{_FG}">{_esc(name)}</text>'
        )
    return _svg(body, title)


# ---------------------------------------------------------------------------
# Figure data (Spark aggregations) + rendering
# ---------------------------------------------------------------------------


def generate_report_figures(
    preds: DataFrame, out_dir: str, max_points: int = 2000
) -> list[str]:
    """Render the reference's six report figures from a predictions
    frame (columns: prediction, ArrDelay, predicted_label,
    actual_label, optionally DepTime_TOD). All shaping is Spark-side;
    the driver only sees per-figure aggregates and one hash-sampled
    point set of <= max_points rows. Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def emit(name: str, svg: str) -> None:
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(svg)
        written.append(path)

    have_labels = {"predicted_label", "actual_label"} <= set(preds.columns)
    if have_labels:
        # crosstab via pivot with the FIXED label set: no second pass to
        # discover pivot values, schema stable regardless of data
        ct = {
            r["actual_label"]: r
            for r in preds.groupBy("actual_label")
            .pivot("predicted_label", LABELS)
            .count()
            .collect()
        }
        counts = []
        for a in LABELS:
            row = ct.get(a)
            counts.append(
                [float(row[p] or 0) if row is not None else 0.0 for p in LABELS]
            )
        emit(
            "confusion_matrix_counts.svg",
            _heatmap_svg(
                "Confusion matrix (counts)",
                counts,
                "%d",
                max(v for row in counts for v in row) or 1,
            ),
        )
        norm = [
            [v / s for v in row] if (s := sum(row)) else [0.0] * len(row)
            for row in counts
        ]
        emit(
            "confusion_matrix_normalized.svg",
            _heatmap_svg(
                "Confusion matrix (normalized by true label)", norm, "%.2f", 1.0
            ),
        )
        emit(
            "label_distribution.svg",
            _bars_svg(
                "Actual label distribution",
                [(a, sum(row)) for a, row in zip(LABELS, counts)],
            ),
        )

    resid = preds.select(
        F.col("prediction").cast("double").alias("pred"),
        F.col("ArrDelay").cast("double").alias("actual"),
        (F.col("prediction") - F.col("ArrDelay")).cast("double").alias("res"),
    ).filter(F.col("actual").isNotNull() & F.col("pred").isNotNull())

    stats = resid.agg(
        F.avg(F.abs(F.col("res"))).alias("mae"),
        F.sqrt(F.avg(F.col("res") * F.col("res"))).alias("rmse"),
        F.avg("res").alias("mean_res"),
        F.expr("percentile(res, 0.5)").alias("median_res"),
        F.min("res").alias("lo"),
        F.max("res").alias("hi"),
        F.least(F.min("actual"), F.min("pred")).alias("axis_lo"),
        F.greatest(F.max("actual"), F.max("pred")).alias("axis_hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()

    if stats["n"]:
        # A: pred vs actual — deterministic md5 sample, never full collect
        frac = min(1.0, max_points / stats["n"])
        bound = int(frac * (1 << 32))
        sampled = resid.filter(
            F.conv(F.substring(F.md5(F.col("pred").cast("string")), 1, 8), 16, 10)
            .cast("long")
            < F.lit(bound)
        ).limit(max_points)
        pts = [(r["actual"], r["pred"]) for r in sampled.collect()]
        emit(
            "pred_vs_actual.svg",
            _scatter_svg(
                f"Predicted vs Actual (MAE={stats['mae']:.2f}, RMSE={stats['rmse']:.2f})",
                pts,
                float(stats["axis_lo"]),
                float(stats["axis_hi"]),
            ),
        )

        # B: residual histogram, 30 fixed-width bins computed in Spark
        nbins = 30
        lo, hi = float(stats["lo"]), float(stats["hi"])
        width = ((hi - lo) or 1.0) / nbins
        by_bin = dict(
            resid.select(
                F.least(
                    F.floor((F.col("res") - F.lit(lo)) / F.lit(width)),
                    F.lit(nbins - 1),
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .count()
            .collect()
        )
        emit(
            "residuals_hist.svg",
            _hist_svg(
                "Residuals (prediction - actual)",
                [lo + i * width for i in range(nbins + 1)],
                [int(by_bin.get(i, 0)) for i in range(nbins)],
                float(stats["mean_res"]),
                float(stats["median_res"]),
            ),
        )

    # E: mean actual vs predicted per time-of-day window
    if "DepTime_TOD" in preds.columns:
        rows = (
            preds.filter(F.col("DepTime_TOD").isNotNull())
            .groupBy("DepTime_TOD")
            .agg(F.avg("ArrDelay").alias("actual"), F.avg("prediction").alias("pred"))
            .orderBy("DepTime_TOD")
            .collect()
        )
        if rows:
            emit(
                "mean_by_timewindow.svg",
                _lines_svg(
                    "Mean Actual vs Predicted by Time Window",
                    [r["DepTime_TOD"] for r in rows],
                    {
                        "Actual": [float(r["actual"]) for r in rows],
                        "Predicted": [float(r["pred"]) for r in rows],
                    },
                ),
            )
    return written


def main(argv: list[str] | None = None) -> list[str]:
    """CLI: python -m ...app.figures PREDICTIONS_PARQUET_OR_CSV OUT_DIR.
    Reads the predictions artifact the app/cli train path writes."""
    import argparse

    p = argparse.ArgumentParser(prog="flight-delay-figures")
    p.add_argument("predictions", help="predictions parquet dir or CSV file")
    p.add_argument("out_dir", help="directory for the SVG figures")
    args = p.parse_args(argv)

    from flight_delay_prediction_using_pyspark_spark.session import get_spark

    spark = get_spark(app_name="flight-delay-figures")
    if args.predictions.endswith(".csv"):
        preds = (
            spark.read.option("header", "true")
            .option("nullValue", "NA")
            .option("inferSchema", "true")
            .csv(args.predictions)
        )
    else:
        preds = spark.read.parquet(args.predictions)
    written = generate_report_figures(preds, args.out_dir)
    print({"figures": written})
    return written


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
