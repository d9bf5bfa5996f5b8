"""dCKKS: threshold/multiparty CKKS protocols (SURVEY.md section 2.5)."""

from lattigo_tpu.models.dckks.protocols import (
    CKGProtocol,
    CKSProtocol,
    PCKSProtocol,
    RefreshProtocol,
    RKGProtocol,
    RTGProtocol,
)

__all__ = [
    "CKGProtocol",
    "CKSProtocol",
    "PCKSProtocol",
    "RKGProtocol",
    "RTGProtocol",
    "RefreshProtocol",
]
