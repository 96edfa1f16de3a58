"""Minimal aligned-column table formatter.

User-facing tabular output (tensor listings, profiler reports, benchmark
summaries) — the role reference src/table.h's 618-line generic formatter
plays, reduced to what a Python console tool needs.
"""

from __future__ import annotations

__all__ = ["Table"]


class Table:
    def __init__(self, columns: list[str]):
        self.columns = [str(c) for c in columns]
        self.rows: list[list[str]] = []

    def add(self, *values) -> None:
        if len(values) != len(self.columns):
            raise ValueError(f"expected {len(self.columns)} values, got {len(values)}")
        self.rows.append([str(v) for v in values])

    def format(self, title: str | None = None) -> str:
        widths = [len(c) for c in self.columns]
        for row in self.rows:
            for i, cell in enumerate(row):
                widths[i] = max(widths[i], len(cell))

        def fmt_row(cells: list[str]) -> str:
            return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

        sep = "+-" + "-+-".join("-" * w for w in widths) + "-+"
        out = []
        if title:
            out.append(title)
        out.extend([sep, fmt_row(self.columns), sep])
        out.extend(fmt_row(r) for r in self.rows)
        out.append(sep)
        return "\n".join(out)


def human_size(n: int) -> str:
    """Human-readable byte size (the reference table.h's ``{h}`` format)."""
    size = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if size < 1024 or unit == "TiB":
            return f"{size:.0f} {unit}" if unit == "B" else f"{size:.2f} {unit}"
        size /= 1024
    return f"{n} B"  # unreachable
