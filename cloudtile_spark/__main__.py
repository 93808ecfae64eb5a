"""python -m cloudtile_spark — reference parity with src/cloudtile/__main__.py."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
