"""Leveled logger (reference include/mitsuba/core/logger.h + appender.h:
Trace/Debug/Info/Warn/Error levels, a global logger with a settable
threshold, timestamped formatting). Python-thin by design — the heavy
log machinery of the C++ reference (thread names, appender lists) adds
nothing in a single-process JAX host program; the API surface (Log,
set_log_level, log_level) is what call sites need."""
from __future__ import annotations

import sys
import time

Trace, Debug, Info, Warn, Error = 0, 100, 200, 300, 400

_NAMES = {Trace: 'TRACE', Debug: 'DEBUG', Info: 'INFO',
          Warn: 'WARN', Error: 'ERROR'}

_level = Info
_t0 = time.time()


def set_log_level(level: int) -> None:
    """Threshold below which messages are dropped (logger.h:67)."""
    global _level
    _level = level


def log_level() -> int:
    return _level


def Log(level: int, msg: str, *fmt_args, file=None) -> None:
    """Emit a message if at or above the current threshold. Error-level
    messages raise (the reference Throw/Log(Error) semantics)."""
    if fmt_args:
        msg = msg % fmt_args
    if level >= Error:
        raise RuntimeError(msg)
    if level < _level:
        return
    name = _NAMES.get(level, str(level))
    out = file or (sys.stderr if level >= Warn else sys.stdout)
    print(f"{time.time() - _t0:9.3f}s {name:5s} {msg}", file=out)
