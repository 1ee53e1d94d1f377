"""Config layering for the crawl driver — the reference's
Flags -> Env -> YAML merge (config/config.go:98-156; viper semantics:
an explicitly-passed flag wins, then ``ZENO_*`` environment variables
with ``-``/``.`` mapped to ``_``, then the config file, then the
option's default).  The Consul remote tier (config.go:129-144) is the
same document read from Consul's KV store over its public HTTP API
(``fetch_consul_yaml``), layered between env and the local file exactly
as viper's read-remote-after-file ordering implies.

No external YAML dependency is available in this image, so the parser
is a deliberate SUBSET of YAML sufficient for a flat crawl config:

  * ``key: value`` scalars (str / int / float / bool / null)
  * inline lists ``key: [a, b, c]``
  * block lists::

        excluded-hosts:
          - a.example
          - b.example

  * ``#`` comments and blank lines
  * quoted strings (single or double)

Nested mappings are rejected loudly rather than misread.  Keys are
normalized to snake_case so YAML may use the reference's dashed flag
names (``per-host-budget``) or python names interchangeably.
"""

from __future__ import annotations

from typing import Any, Mapping

ENV_PREFIX = "ZENO_"


def _scalar(raw: str) -> Any:
    s = raw.strip()
    if not s or s.lower() in ("null", "~"):
        return None
    if s[0] in ('"', "'"):
        if len(s) < 2 or s[-1] != s[0]:
            raise ValueError(f"unterminated quoted string: {raw!r}")
        return s[1:-1]
    low = s.lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _norm_key(k: str) -> str:
    return k.strip().replace("-", "_").replace(".", "_")


def _strip_comment(raw: str) -> str:
    """Drop a trailing ``#`` comment, YAML-style: the ``#`` must be
    outside quotes AND at line start or preceded by whitespace — so
    ``ua: "zeno (#42)"`` and ``seed: http://x/page#frag`` survive
    intact while ``budget: 8  # per host`` is trimmed.  A quote opens
    ONLY as the first character of a value (right after ``:``, a list
    ``-``, or inside ``[...]`` after ``[``/``,`` — YAML's rule), so an
    apostrophe inside an unquoted scalar (``note: O'Reilly bot  # x``)
    is plain text, not a quote."""
    quote = None
    at_value_start = False
    in_list = False
    for i, ch in enumerate(raw):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch == "#" and (i == 0 or raw[i - 1] in (" ", "\t")):
            return raw[:i]
        if at_value_start:
            if ch in (" ", "\t"):
                continue
            at_value_start = False
            if ch in ("'", '"'):
                quote = ch
            elif ch == "[":
                in_list = True
                at_value_start = True  # first item may be quoted
        elif ch == ":" or (ch == "-" and not raw[:i].strip()):
            at_value_start = True
        elif in_list and ch == ",":
            at_value_start = True
        elif in_list and ch == "]":
            in_list = False
    return raw


def parse_simple_yaml(text: str) -> dict[str, Any]:
    """Flat-YAML subset parser (module docstring).  Raises ValueError on
    structures outside the subset so a mis-shaped file fails loudly."""
    out: dict[str, Any] = {}
    pending_list: str | None = None
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = _strip_comment(raw).rstrip()
        if not line.strip():
            continue
        if line.lstrip().startswith("- "):
            if pending_list is None:
                raise ValueError(f"line {lineno}: list item outside a list")
            out[pending_list].append(_scalar(line.lstrip()[2:]))
            continue
        if line[0] in (" ", "\t"):
            raise ValueError(
                f"line {lineno}: nested mappings are outside the "
                f"supported flat-config subset"
            )
        pending_list = None
        key, sep, value = line.partition(":")
        if not sep:
            raise ValueError(f"line {lineno}: expected 'key: value'")
        key = _norm_key(key)
        value = value.strip()
        if not value:
            out[key] = []
            pending_list = key
        elif value.startswith("[") and value.endswith("]"):
            inner = value[1:-1].strip()
            out[key] = (
                [_scalar(v) for v in inner.split(",")] if inner else []
            )
        else:
            out[key] = _scalar(value)
    return out


def _coerce(value: Any, like: Any) -> Any:
    """Coerce a yaml/env value to the type of the CLI default it
    overrides (viper's Get* typing)."""
    if like is None or value is None:
        return value
    if isinstance(like, bool):
        if isinstance(value, bool):
            return value
        return str(value).strip().lower() in ("1", "true", "yes", "on")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(value)
    if isinstance(like, float):
        return float(value)
    if isinstance(like, (list, tuple)):
        if isinstance(value, str):
            value = [v.strip() for v in value.split(",") if v.strip()]
        return type(like)(value)
    return str(value)


def fetch_consul_yaml(address: str, path: str,
                      timeout: float = 5.0) -> str:
    """Consul remote tier (config/config.go:129-144): read the config
    FILE CONTENT from Consul's KV store via the public HTTP API —
    ``GET <address>/v1/kv/<path>?raw`` returns the stored value bytes
    verbatim (no base64 envelope), which for the reference is the same
    YAML document a --config file would hold.  Failures raise loudly
    (the reference propagates viper's remote-read error out of
    InitConfig): a crawl must never start on silently-missing remote
    config."""
    import urllib.request

    url = f"{address.rstrip('/')}/v1/kv/{path.lstrip('/')}?raw"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if resp.status >= 300:
                raise RuntimeError(f"consul KV read failed: {resp.status}")
            return resp.read().decode("utf-8")
    except OSError as e:
        raise RuntimeError(
            f"consul KV read failed for {url}: {e}"
        ) from e


def layered_defaults(
    base: Mapping[str, Any],
    yaml_path: str | None = None,
    env: Mapping[str, str] | None = None,
    consul: tuple[str, str] | None = None,
) -> dict[str, Any]:
    """Merge the env, Consul, and config-file layers UNDER the CLI
    flags: returns an updated defaults dict for argparse
    ``set_defaults`` — an explicitly-passed flag then wins
    automatically, which is exactly viper's precedence
    (Flags > Env > Consul > File > defaults; the reference reads the
    remote provider AFTER the local file, config/config.go:125-144, so
    remote values shadow file values at the config-file layer).

    ``base`` maps option dest names (snake_case) to their hardcoded
    defaults; values from the file/consul/env are coerced to the
    default's type.  Unknown file/consul keys raise (a typo'd option
    must not silently no-op); unknown ZENO_* env vars are ignored (the
    environment legitimately carries unrelated variables).
    ``consul`` = (address, kv_path), e.g.
    ``("http://127.0.0.1:8500", "zeno/config.yaml")``."""
    import os

    merged = dict(base)

    def _apply(text: str, source: str) -> None:
        vals = parse_simple_yaml(text)
        unknown = set(vals) - set(merged)
        if unknown:
            raise ValueError(
                f"unknown config keys in {source}: {sorted(unknown)}"
            )
        for k, v in vals.items():
            merged[k] = _coerce(v, base[k])

    if yaml_path:
        with open(yaml_path) as fh:
            _apply(fh.read(), yaml_path)
    if consul is not None:
        address, kv_path = consul
        _apply(fetch_consul_yaml(address, kv_path),
               f"consul:{address}/{kv_path}")
    env = os.environ if env is None else env
    for k in base:
        ev = env.get(ENV_PREFIX + k.upper())
        if ev is not None:
            merged[k] = _coerce(ev, base[k])
    return merged
