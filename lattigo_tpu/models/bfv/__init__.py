"""BFV: exact integer SIMD homomorphic encryption, TPU-native.

Capability parity with the reference's bfv package (see SURVEY.md section 2.3);
architecture is functional JAX — pure evaluator methods over pytree elements,
jit-able end to end.
"""

from lattigo_tpu.models.bfv.context import BFVContext, get_context
from lattigo_tpu.models.bfv.elements import Ciphertext, Plaintext
from lattigo_tpu.models.bfv.encoder import Encoder
from lattigo_tpu.models.bfv.encryptor import Decryptor, Encryptor
from lattigo_tpu.models.bfv.evaluator import Evaluator
from lattigo_tpu.models.bfv.keygen import (
    EvaluationKey,
    KeyGenerator,
    PublicKey,
    RotationKeys,
    SecretKey,
    SwitchingKey,
)
from lattigo_tpu.models.bfv.params import (
    PN12QP109,
    PN13QP218,
    PN14QP438,
    PN15QP880,
    Parameters,
    default_params,
)

__all__ = [
    "BFVContext",
    "Ciphertext",
    "Decryptor",
    "Encoder",
    "EncryptionKey",
    "Encryptor",
    "EvaluationKey",
    "Evaluator",
    "KeyGenerator",
    "Parameters",
    "Plaintext",
    "PublicKey",
    "RotationKeys",
    "SecretKey",
    "SwitchingKey",
    "default_params",
    "get_context",
    "PN12QP109",
    "PN13QP218",
    "PN14QP438",
    "PN15QP880",
]
