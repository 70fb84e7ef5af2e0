"""Minimal TOML serializer for config dump/print/table.

Python ships ``tomllib`` (read-only); the reference used the ``toml``
package for both directions (/root/reference/lib/utils/get_config.py:71,77).
This writer covers the subset of TOML the config tree uses: scalars,
lists (possibly nested), and nested tables.
"""

from __future__ import annotations


def _fmt_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{escaped}"'
    if isinstance(v, float):
        # TOML requires floats to contain a dot or exponent.
        s = repr(v)
        if "." not in s and "e" not in s and "inf" not in s and "nan" not in s:
            s += ".0"
        return s
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt_scalar(x) for x in v) + "]"
    raise TypeError(f"Cannot serialize {type(v)} to TOML: {v!r}")


def dumps(d: dict, _prefix: str = "") -> str:
    """Serialize a (possibly nested) dict to TOML text with sorted keys."""
    lines = []
    scalars = {k: v for k, v in sorted(d.items()) if not isinstance(v, dict)}
    tables = {k: v for k, v in sorted(d.items()) if isinstance(v, dict)}
    for k, v in scalars.items():
        lines.append(f"{k} = {_fmt_scalar(v)}")
    for k, v in tables.items():
        name = f"{_prefix}{k}"
        lines.append("")
        lines.append(f"[{name}]")
        lines.append(dumps(v, _prefix=name + "."))
    return "\n".join(lines).strip() + "\n"


def dump(d: dict, fp) -> None:
    fp.write(dumps(d))
