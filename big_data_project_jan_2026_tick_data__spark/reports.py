"""Report artifacts: the human-facing outputs the reference produces.

Mirrors ``Symbol Data And Stats/symbol_statistics_generate.py:90-104``,
which writes one ``<symbol>_daily_window_counts.csv`` per symbol plus a
matplotlib plot of the daily tick counts. The heavy part (the daily
aggregation) is the distributed ``stats.daily_window_counts`` plan; this
module only renders its already-tiny result (one row per day per symbol
— metadata-scale by construction, so a driver-side render is correct,
not a scale smell).

Matplotlib is optional (absent from minimal clusters): plots are skipped
with a flag rather than failing the report.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_daily_stats_report(
    daily_counts: DataFrame,
    out_dir: str,
    symbol_col: str = "symbol",
    date_col: str = "date",
    make_plots: bool = True,
) -> dict[str, list[str]]:
    """Render per-symbol daily-count reports.

    ``daily_counts``: output of ``stats.daily_window_counts`` with a
    symbol column — (symbol, date, ticks_window1, ticks_window2, ...).
    Writes ``<out_dir>/<symbol>_daily_window_counts.csv`` per symbol
    (reference file naming) and, when matplotlib is importable and
    ``make_plots``, ``<symbol>_daily_window_counts.png``.

    Returns ``{"csv": [paths], "plots": [paths]}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    pdf = daily_counts.toPandas().sort_values([symbol_col, date_col])
    value_cols = [c for c in pdf.columns if c not in (symbol_col, date_col)]

    csv_paths: list[str] = []
    plot_paths: list[str] = []

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        plt = None

    for symbol, grp in pdf.groupby(symbol_col):
        csv_path = os.path.join(out_dir, f"{symbol}_daily_window_counts.csv")
        grp.drop(columns=[symbol_col]).to_csv(csv_path, index=False)
        csv_paths.append(csv_path)

        if make_plots and plt is not None:
            fig, ax = plt.subplots(figsize=(10, 4))
            for c in value_cols:
                ax.plot(grp[date_col], grp[c], label=c)
            ax.set_title(f"{symbol} daily session-window tick counts")
            ax.set_xlabel("date")
            ax.set_ylabel("ticks")
            ax.legend()
            fig.autofmt_xdate()
            png_path = os.path.join(out_dir, f"{symbol}_daily_window_counts.png")
            fig.savefig(png_path, dpi=80, bbox_inches="tight")
            plt.close(fig)
            plot_paths.append(png_path)

    return {"csv": csv_paths, "plots": plot_paths}
