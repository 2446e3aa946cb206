"""Runtime configuration registry + ``set_config_from_env_vars``.

Mirrors the reference's env-var configuration surface
(``python/arcticdb/tools.py:34-95``): keys prefixed ``ARCTICDB_`` /
``ARCTIC_NATIVE_`` configure typed runtime settings; the last ``_``-word
names the type (INT / FLOAT / STR / LOGLEVEL, default STR) and the middle
words join with ``.`` into the setting name. The reference routes these to
its native set_config_* registry; this engine keeps an in-process registry
(``get_config`` / ``set_config_*``) consulted by tuning knobs — the
parsing contract is the compatibility surface.
"""

from __future__ import annotations

from typing import Dict

_PREFIXES = ("ARCTIC_NATIVE_", "ARCTICDB_")
_TYPES = {"INT", "FLOAT", "STR", "LOGLEVEL"}

_config: dict = {}
_log_levels: dict = {}


def set_config_int(name: str, value: int) -> None:
    _config[name] = int(value)


def set_config_string(name: str, value: str) -> None:
    _config[name] = str(value)


def set_config_double(name: str, value: float) -> None:
    _config[name] = float(value)


def get_config(name: str, default=None):
    return _config.get(name, default)


def set_log_level(default_level: str = "INFO",
                  specific_log_levels: Dict[str, str] | None = None) -> None:
    """Reference ``config.py`` set_log_level shape: a default plus
    per-stream overrides. Spark drives the real logging; the levels are
    recorded for introspection."""
    _log_levels["default"] = default_level.upper()
    for stream, level in (specific_log_levels or {}).items():
        _log_levels[stream] = level.upper()


def set_config_from_env_vars(env_vars: Dict[str, str] | None) -> None:
    """Parse ARCTICDB_* / ARCTIC_NATIVE_* entries into the config registry
    (reference tools.py:34-95). ``ARCTICDB_FOO_BAR_int=3`` sets the INT
    setting ``FOO.BAR``; an unrecognized type suffix means STR with the
    suffix kept as part of the name; ``..._loglevel`` entries feed
    set_log_level (``ALL`` sets the default)."""
    if env_vars is None:
        return
    log_level_changes: dict = {}
    default_log_level = "INFO"
    for k, v in env_vars.items():
        k = k.upper()
        start_index = None
        if k.startswith(_PREFIXES[0]):
            start_index = 2
        elif k.startswith(_PREFIXES[1]):
            start_index = 1
        if start_index is None:
            continue
        w = k.split("_")
        var_type = w[-1] if w[-1] in _TYPES else None
        name = ".".join(w[start_index:] if var_type is None
                        else w[start_index:-1])
        var_type = var_type or "STR"
        try:
            if var_type == "STR":
                set_config_string(name, v)
            elif var_type == "INT":
                set_config_int(name, int(v))
            elif var_type == "FLOAT":
                set_config_double(name, float(v))
            else:  # LOGLEVEL
                if name.upper() == "ALL":
                    default_log_level = v.upper()
                else:
                    log_level_changes[name.lower()] = v.upper()
        except ValueError:
            # reference logs and skips unparseable values
            continue
    if log_level_changes or default_log_level != "INFO":
        set_log_level(default_log_level, log_level_changes)
