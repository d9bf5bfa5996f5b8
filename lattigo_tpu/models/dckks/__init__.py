"""dCKKS: threshold/multiparty CKKS protocols (SURVEY.md section 2.5)."""

from lattigo_tpu.models.dckks.protocols import (
    CKGProtocol,
    CKSProtocol,
    PCKSProtocol,
    RefreshProtocol,
    RKGProtocol,
    RKGProtocolNaive,
    RTGProtocol,
)

__all__ = [
    "CKGProtocol",
    "CKSProtocol",
    "PCKSProtocol",
    "RKGProtocol",
    "RKGProtocolNaive",
    "RTGProtocol",
    "RefreshProtocol",
]
