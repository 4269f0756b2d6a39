"""Interop with the PyTorch reference implementation (checkpoint import)."""

from multilingual_text_to_speech_tpu.interop.torch_port import (  # noqa: F401
    criterion_state_from_reference,
    hp_from_reference_state,
    import_reference_checkpoint,
    merge_into,
    port_state_dict,
    port_tacotron,
    strip_dataparallel_prefix,
)
