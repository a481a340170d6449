"""YAML <-> JSON schema-document conversion — the driver-side utility
surface of the reference's ``schema/yaml_json_converter.py:53-136``
(its YamlJsonConverter converts a schema file between the two
serializations by extension, refusing same-type no-op conversions).

Driver-side by design: schema documents are small metadata files, never
data-plane. PyYAML is gated behind an import-try per the environment
contract; JSON-side operations work without it.
"""

from __future__ import annotations

import json
from typing import Any

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover - baked into this environment
    _yaml = None

_YAML_EXTS = (".yml", ".yaml")


def detect_format(path: str) -> str:
    """'yaml' | 'json' from the file extension; ValueError otherwise."""
    low = path.lower()
    if low.endswith(_YAML_EXTS):
        return "yaml"
    if low.endswith(".json"):
        return "json"
    raise ValueError(f"unsupported schema file type: {path}")


def load(path: str, encoding: str = "utf-8") -> Any:
    """Parse a schema document in either serialization."""
    with open(path, encoding=encoding) as fh:
        if detect_format(path) == "yaml":
            if _yaml is None:
                raise RuntimeError("PyYAML is not available for YAML input")
            return _yaml.safe_load(fh)
        return json.load(fh)


def save(data: Any, path: str, encoding: str = "utf-8") -> None:
    """Write a schema document in the serialization the extension asks
    for (JSON pretty-printed with non-ASCII preserved, YAML block
    style). Serialization happens BEFORE the destination is opened, so
    a failure (missing PyYAML, unserializable data) never truncates or
    creates a partial artifact."""
    if detect_format(path) == "yaml":
        if _yaml is None:
            raise RuntimeError("PyYAML is not available for YAML output")
        payload = _yaml.safe_dump(data, indent=2, sort_keys=False)
    else:
        payload = json.dumps(data, indent=2, ensure_ascii=False)
    with open(path, "w", encoding=encoding) as fh:
        fh.write(payload)


def convert(src: str, dst: str) -> None:
    """Convert ``src`` to ``dst`` across serializations; a same-format
    pair is refused (a copy is not a conversion — reference
    ``yaml_json_converter.py:122-125``)."""
    if detect_format(src) == detect_format(dst):
        raise ValueError(
            f"{src} and {dst} are the same format; conversion not required"
        )
    save(load(src), dst)


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(f"usage: {argv[0]} <input file> <output file>")
        return 2
    convert(argv[1], argv[2])
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv))
