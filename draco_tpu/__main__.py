"""``python -m draco_tpu {run,lint} config.yaml`` — pipeline CLI.

The reference exposes this as the ``caput-pipeline`` console script
(reference caput setup entry point, consumed in draco's examples);
here the package itself is executable.
"""

from .core.pipeline import main

if __name__ == "__main__":
    raise SystemExit(main())
