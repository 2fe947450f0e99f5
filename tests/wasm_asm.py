"""Re-export of the package assembler (connect_spark/wasm/asm.py)."""

from connect_spark.wasm.asm import *  # noqa: F401,F403
