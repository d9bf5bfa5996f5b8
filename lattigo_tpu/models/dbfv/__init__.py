"""dBFV: threshold/multiparty BFV protocols (SURVEY.md section 2.5)."""

from lattigo_tpu.models.dbfv.protocols import (
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
