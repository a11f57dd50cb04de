"""JSONata error types.

The reference maps both parse and eval failures to Kafka Connect
``DataException`` (reference JsonataTransformation.java:69-77,105-107);
we keep a single exception type with a spec-style code."""

from __future__ import annotations


class JsonataError(Exception):
    def __init__(self, code: str, message: str, position: int | None = None):
        self.code = code
        self.position = position
        super().__init__(f"{code}: {message}" + (f" @ {position}" if position is not None else ""))


class JsonataParseError(JsonataError):
    pass


class JsonataTimeoutError(JsonataError):
    """Eval exceeded the wall-clock guard (reference default 5000 ms,
    JsonataTransformationConfig.java:40-46)."""

    def __init__(self, timeout_ms: int):
        super().__init__("U1001", f"expression evaluation timed out after {timeout_ms} ms")


class JsonataDepthError(JsonataError):
    """Recursion exceeded the depth guard (reference default 1000,
    JsonataTransformationConfig.java:47-53)."""

    def __init__(self, max_depth: int):
        super().__init__("U1002", f"stack overflow: recursion depth exceeded {max_depth}")
