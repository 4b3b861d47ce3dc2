"""Parameter-documentation generator.

The reference auto-generates its parameter documentation from
``src/pism_config.cdl`` (the doc build turns every CDL entry into a
manual page with type, default, units and description). We generate the
same artifact from :data:`pism_tpu.config.parameters.PARAMETERS`:

- ``python -m pism_tpu -list_params`` prints the table to stdout;
- :func:`write_markdown` renders ``docs/PARAMETERS.md``.
"""

from __future__ import annotations

from .parameters import PARAMETERS


def _type_of(value) -> str:
    if isinstance(value, bool):
        return "flag"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    return "string"


def iter_rows():
    for name in sorted(PARAMETERS):
        value, units, doc = PARAMETERS[name]
        yield name, _type_of(value), value, (units or ""), (doc or "")


def print_table(stream=None) -> None:
    import sys
    stream = stream or sys.stdout
    for name, typ, value, units, doc in iter_rows():
        u = f" [{units}]" if units else ""
        stream.write(f"{name} ({typ}, default {value!r}{u}): {doc}\n")


def write_markdown(path: str) -> int:
    """Render the parameter reference page; returns the parameter count."""
    groups: dict = {}
    for row in iter_rows():
        groups.setdefault(row[0].split(".", 1)[0], []).append(row)
    n = 0
    with open(path, "w") as f:
        f.write("# Configuration parameters\n\n")
        f.write("Generated from `pism_tpu/config/parameters.py` "
                "(regenerate with `python -m pism_tpu.config.docgen`). "
                "Parameter names follow the reference's "
                "`pism_config.cdl`; every parameter is also a CLI flag "
                "via `-config_override name=value`.\n")
        for group in sorted(groups):
            f.write(f"\n## `{group}.*`\n\n")
            f.write("| parameter | type | default | units | description |\n")
            f.write("|---|---|---|---|---|\n")
            for name, typ, value, units, doc in groups[group]:
                doc = doc.replace("|", "\\|")
                f.write(f"| `{name}` | {typ} | `{value!r}` | {units} "
                        f"| {doc} |\n")
                n += 1
    return n


if __name__ == "__main__":
    import os
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out = os.path.join(here, "docs", "PARAMETERS.md")
    print(f"{write_markdown(out)} parameters -> {out}")
