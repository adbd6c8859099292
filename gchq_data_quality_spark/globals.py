"""Global sampling configuration.

Parity: reference src/gchq_data_quality/globals.py:27-38 (SampleConfig).
"""


class SampleConfig:
    """Caps the size of diagnostic samples in results.

    ``RECORDS_FAILED_SAMPLE_SIZE`` bounds both ``records_failed_sample``
    and ``records_failed_ids`` on a DataQualityResult.
    """

    RECORDS_FAILED_SAMPLE_SIZE: int = 10
