from .warc import read_warc, records_to_warc_gz, warc_record  # noqa: F401
