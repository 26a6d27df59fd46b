"""Profile artifact -> human-readable markdown report (the engine's
analogue of the reference's ydata-profiling DQ_report.html hook, S5 at
configuration.py:559-566 — here the Profile artifact IS the report)."""

from __future__ import annotations

from .profile import POOLED, TableProfile


def profile_to_markdown(prof: TableProfile, title: str = "Data profile"
                        ) -> str:
    lines = [f"# {title}", "",
             f"rows: **{prof.n_rows}**"
             + (f" · fingerprint `{prof.fingerprint}`"
                if prof.fingerprint else ""), "",
             "| column | kind | n | nulls | distinct | min | max | mean "
             "| std | p25 | p50 | p75 | mode |",
             "|---|---|---|---|---|---|---|---|---|---|---|---|---|"]
    for name, s in prof.columns.items():
        if name == POOLED:
            continue
        m = s.moments

        def fmt(x):
            if x is None:
                return ""
            if isinstance(x, float):
                return f"{x:.6g}"
            return str(x)

        if s.kind in ("numeric", "timestamp"):
            stats = [fmt(m.vmin), fmt(m.vmax), fmt(m.mean), fmt(m.std),
                     fmt(s.quantile(0.25)), fmt(s.quantile(0.5)),
                     fmt(s.quantile(0.75)), ""]
        else:
            mode = s.mode()
            stats = ["", "", "", "", "", "", "",
                     fmt(mode[0]) if mode else ""]
        approx = "" if s.exact_quantiles else "~"
        lines.append(
            f"| {name} | {s.kind} | {s.count} | {s.null_count} "
            f"| {approx}{round(s.distinct())} | " + " | ".join(stats) + " |")
    lines.append("")
    if POOLED in prof.columns:
        s = prof.columns[POOLED]
        lines.append(
            f"pooled (reference global-flattened stats): "
            f"p25={s.quantile(0.25):.6g} p50={s.quantile(0.5):.6g} "
            f"p75={s.quantile(0.75):.6g}")
        lines.append("")
    return "\n".join(lines)
