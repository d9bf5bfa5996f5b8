"""CKKS: approximate complex-number homomorphic encryption, TPU-native.

Capability parity with the reference's ckks package (SURVEY.md section 2.4):
leveled NTT-domain evaluator with automatic scale management, rescaling,
hoisted rotations, BSGS/Chebyshev polynomial evaluation.
"""

from lattigo_tpu.models.ckks import algorithms
from lattigo_tpu.models.ckks.context import CKKSContext, get_context
from lattigo_tpu.models.ckks.elements import Ciphertext, Plaintext
from lattigo_tpu.models.ckks.encoder import Encoder
from lattigo_tpu.models.ckks.encryptor import Decryptor, Encryptor
from lattigo_tpu.models.ckks.evaluator import Evaluator, JitEvaluator
from lattigo_tpu.models.ckks.keygen import (
    EvaluationKey,
    KeyGenerator,
    PublicKey,
    RotationKeys,
    SecretKey,
    SwitchingKey,
)
from lattigo_tpu.models.ckks.params import (
    PN12QP109,
    PN13QP218,
    PN14QP438,
    PN15QP880,
    PN16QP1761,
    Parameters,
    default_params,
)
from lattigo_tpu.models.ckks.polynomial_evaluation import (
    ChebyshevInterpolation,
    approximate,
    evaluate_cheby_eco,
    evaluate_cheby_fast,
    evaluate_poly_eco,
    evaluate_poly_fast,
)

__all__ = [
    "CKKSContext",
    "ChebyshevInterpolation",
    "Ciphertext",
    "Decryptor",
    "Encoder",
    "Encryptor",
    "EvaluationKey",
    "Evaluator",
    "JitEvaluator",
    "KeyGenerator",
    "Parameters",
    "Plaintext",
    "PublicKey",
    "RotationKeys",
    "SecretKey",
    "SwitchingKey",
    "algorithms",
    "approximate",
    "default_params",
    "evaluate_cheby_eco",
    "evaluate_cheby_fast",
    "evaluate_poly_eco",
    "evaluate_poly_fast",
    "get_context",
]
