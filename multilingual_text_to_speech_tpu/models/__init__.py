"""Model layer: Tacotron 2 variants as Flax linen modules.

Feature-parity rebuild of the reference ``modules/`` package
(encoders, attentions, decoder, postnets, adversarial classifiers),
re-designed for XLA: channels-last layouts, ``lax.scan`` recurrences,
grouped-language convolutions as batched einsums, meta-generated
parameters as traced tensors.
"""

from multilingual_text_to_speech_tpu.models.tacotron import (
    Tacotron,
    TacotronLossState,
    build_model,
    tacotron_loss,
)

__all__ = ["Tacotron", "TacotronLossState", "build_model", "tacotron_loss"]
