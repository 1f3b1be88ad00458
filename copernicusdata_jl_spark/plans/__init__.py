from .payload import Payload, PayloadWorkflow, parse_payload_file, run  # noqa: F401
