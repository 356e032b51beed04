"""Boolean environment-flag parsing shared by every kernel opt-in/opt-out gate.

All ``IMGADAPOINTR_{ENABLE,DISABLE}_*`` switches go through :func:`env_flag`
so that ``FLAG=0`` / ``FLAG=false`` means OFF — the bare truthiness test the
gates used before treated ANY non-empty value (including ``"0"``) as set.
"""

from __future__ import annotations

import os

_FALSY = {"", "0", "false", "no", "off"}


def env_flag(name: str, default: bool = False) -> bool:
    """Return the boolean value of environment variable ``name``.

    Unset → ``default``.  Set → True unless the value (case-insensitively,
    stripped) is one of ``"", "0", "false", "no", "off"``.
    """
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() not in _FALSY
