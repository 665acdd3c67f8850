from quickstep_tpu.parser.parser import parse_statements, parse_one  # noqa: F401
