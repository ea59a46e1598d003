"""whipsink / whepsrc: WHIP and WHEP over the full WebRTC stack.

Parity target: net/webrtchttp (whipsink, whepsrc).  The reference
implements these on webrtcbin — full ICE/DTLS/SRTP behind WHIP/WHEP
HTTP signaling.  Since the in-repo stack landed (net/webrtc_peer.py),
these names are the same elements as whipclientsink / whepclientsrc
(elements/net/whipwhep.py): POST an SDP offer (application/sdp, Bearer
auth), 201 Created + Location resource, DELETE on teardown, media over
ICE (RFC 8445) + DTLS 1.2 (RFC 6347) + SRTP (RFC 3711).

The earlier plain-RTP media divergence is gone; whipsink interops with
whipserversrc (and any WHIP server) end-to-end encrypted.
"""
from __future__ import annotations

from ...core import register
from .whipwhep import WhepClientSrc, WhipClientSink


@register
class WhipSink(WhipClientSink):
    ELEMENT_NAME = "whipsink"
    ELEMENT_DESCRIPTION = "Sends media to a WHIP endpoint (RFC 9725, DTLS-SRTP)"


@register
class WhepSrc(WhepClientSrc):
    ELEMENT_NAME = "whepsrc"
    ELEMENT_DESCRIPTION = "Receives media from a WHEP endpoint (DTLS-SRTP)"
