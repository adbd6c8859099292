"""Engine error types (parity: reference src/gchq_data_quality/errors.py:1-3)."""


class DQFunctionError(Exception):
    """Raised when a rule expression cannot be compiled or evaluated."""
