"""AWS elements: S3 sources/sinks, Polly TTS, Translate, Transcribe.

Parity targets: net/aws (awss3src, awss3sink, awss3putobjectsink,
awss3hlssink, awspolly, awstranslate, awstranscriber2,
awstranscribeparse).  The reference rides the AWS SDK; here the REST/
event-stream protocols are in-repo (net/sigv4.py, net/s3.py,
net/eventstream.py).  `endpoint-uri` points the S3/REST calls at any
compatible server — tests use in-process fakes; production use signs
against real AWS endpoints with the same code.

Property names follow the reference registry
(docs/plugins/gst_plugins_cache.json `aws` entries); the subset
implemented covers the data path (uri/bucket/key/credentials/
endpoint-uri/part-size/flush-interval-*), not the SDK retry tuning.
"""
from __future__ import annotations

import json
import threading
import urllib.request
from typing import List, Optional, Tuple

import numpy as np

from ...core import (
    BaseSink,
    BaseSrc,
    BaseTransform,
    Buffer,
    Caps,
    FlowReturn,
    Prop,
    register,
)
from ...core.basetransform import TransformMode
from ...core.parse import parse_caps
from ...net import sigv4
from ...net.s3 import S3Client, S3Url


def _client_from_props(el, region: Optional[str] = None) -> S3Client:
    return S3Client(
        region=region or el.get_property("region") or "us-east-1",
        access_key=el.get_property("access-key"),
        secret_key=el.get_property("secret-access-key"),
        session_token=el.get_property("session-token"),
        endpoint_uri=el.get_property("endpoint-uri"),
    )


def _resolve_target(el) -> Tuple[S3Client, str, str]:
    """(client, bucket, key) from uri= or bucket=/key= properties."""
    uri = el.get_property("uri")
    if uri:
        u = S3Url.parse(uri)
        return _client_from_props(el, region=u.region), u.bucket, u.key
    bucket = el.get_property("bucket")
    key = el.get_property("key")
    if not bucket or not key:
        raise ValueError(f"{el.name}: need uri=s3://region/bucket/key or bucket=/key=")
    return _client_from_props(el), bucket, key


_S3_COMMON = [
    Prop("uri", None, type="str", doc="s3://region/bucket/key"),
    Prop("bucket", None, type="str"),
    Prop("key", None, type="str"),
    Prop("region", "us-east-1", type="str"),
    Prop("access-key", None, type="str"),
    Prop("secret-access-key", None, type="str"),
    Prop("session-token", None, type="str"),
    Prop("endpoint-uri", None, type="str"),
    Prop("content-type", None, type="str"),
]


@register
class AwsS3Src(BaseSrc):
    ELEMENT_NAME = "awss3src"
    ELEMENT_CLASS = "Source/Network"
    ELEMENT_DESCRIPTION = "Reads an object from Amazon S3 (SigV4 REST)"
    SRC_CAPS = Caps.builder("application/octet-stream")
    PROPERTIES = _S3_COMMON + [
        Prop("blocksize", 1 << 20, type="uint", doc="bytes per ranged GET"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[S3Client] = None
        self._bucket = self._key = ""
        self._size = 0
        self._pos = 0

    def start(self) -> None:
        self._client, self._bucket, self._key = _resolve_target(self)
        self._size = self._client.head_object(self._bucket, self._key)
        self._pos = 0

    def stop(self) -> None:
        self._client = None

    def create(self):
        if self._pos >= self._size:
            return None
        end = min(self._pos + self.get_property("blocksize"), self._size) - 1
        data = self._client.get_object(self._bucket, self._key, range_=(self._pos, end))
        self._pos += len(data)
        return Buffer(np.frombuffer(data, np.uint8))


@register
class AwsS3Sink(BaseSink):
    """Multipart upload; parts flushed at part-size boundaries, completed on EOS."""

    ELEMENT_NAME = "awss3sink"
    ELEMENT_CLASS = "Sink/Network"
    ELEMENT_DESCRIPTION = "Streams to an S3 object via multipart upload"
    PROPERTIES = _S3_COMMON + [
        Prop("part-size", 5 * 1024 * 1024, type="uint64",
             doc="multipart part size (AWS minimum 5 MiB except the last)"),
        Prop("on-error", "abort-upload", type="str",
             doc="abort-upload | complete-upload | do-nothing"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[S3Client] = None
        self._bucket = self._key = ""
        self._upload_id: Optional[str] = None
        self._parts: List[Tuple[int, str]] = []
        self._pending = bytearray()

    def on_ready_to_paused(self) -> None:
        self._client, self._bucket, self._key = _resolve_target(self)
        self._upload_id = self._client.create_multipart(self._bucket, self._key)
        self._parts = []
        self._pending = bytearray()

    def render(self, buffer: Buffer) -> FlowReturn:
        self._pending += np.asarray(buffer.data, dtype=np.uint8).tobytes()
        part_size = self.get_property("part-size")
        while len(self._pending) >= part_size:
            chunk, self._pending = bytes(self._pending[:part_size]), self._pending[part_size:]
            self._upload_part(chunk)
        return FlowReturn.OK

    def _upload_part(self, data: bytes) -> None:
        n = len(self._parts) + 1
        etag = self._client.upload_part(self._bucket, self._key, self._upload_id, n, data)
        self._parts.append((n, etag))

    def on_event(self, event) -> None:
        from ...core.events import EventType

        if event.type == EventType.EOS and self._upload_id is not None:
            if self._pending:
                self._upload_part(bytes(self._pending))
                self._pending = bytearray()
            self._client.complete_multipart(self._bucket, self._key, self._upload_id, self._parts)
            self._upload_id = None

    def on_paused_to_ready(self) -> None:
        if self._upload_id is not None:
            if self.get_property("on-error") == "complete-upload":
                self._client.complete_multipart(self._bucket, self._key, self._upload_id, self._parts)
            elif self.get_property("on-error") == "abort-upload":
                self._client.abort_multipart(self._bucket, self._key, self._upload_id)
            self._upload_id = None


@register
class AwsS3PutObjectSink(BaseSink):
    """Whole-object PutObject with periodic flushes (next-file style)."""

    ELEMENT_NAME = "awss3putobjectsink"
    ELEMENT_CLASS = "Sink/Network"
    ELEMENT_DESCRIPTION = "Writes accumulated buffers to S3 with PutObject"
    PROPERTIES = _S3_COMMON + [
        Prop("flush-interval-buffers", 0, type="uint", doc="0 = only at EOS"),
        Prop("flush-interval-bytes", 0, type="uint64"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[S3Client] = None
        self._bucket = self._key = ""
        self._data = bytearray()
        self._buffers = 0

    def on_ready_to_paused(self) -> None:
        self._client, self._bucket, self._key = _resolve_target(self)
        self._data = bytearray()
        self._buffers = 0

    def render(self, buffer: Buffer) -> FlowReturn:
        self._data += np.asarray(buffer.data, dtype=np.uint8).tobytes()
        self._buffers += 1
        fb = self.get_property("flush-interval-buffers")
        fby = self.get_property("flush-interval-bytes")
        if (fb and self._buffers % fb == 0) or (fby and len(self._data) >= fby):
            self._flush()
        return FlowReturn.OK

    def _flush(self) -> None:
        self._client.put_object(self._bucket, self._key, bytes(self._data),
                                content_type=self.get_property("content-type"))

    def on_event(self, event) -> None:
        from ...core.events import EventType

        if event.type == EventType.EOS and self._client is not None:
            self._flush()


@register
class AwsS3HlsSink(BaseSink):
    """HLS-to-S3: embeds hlssink3's segmenter, uploading segments + playlist.

    Like the reference (net/aws/src/s3hlssink), this wraps the HLS sink:
    buffers flow into an internal hlscmafsink whose file writes are
    redirected to PutObject calls under key-prefix/.
    """

    ELEMENT_NAME = "awss3hlssink"
    ELEMENT_CLASS = "Sink/Network"
    ELEMENT_DESCRIPTION = "Writes HLS segments and playlists to S3"
    PROPERTIES = [
        Prop("bucket", None, type="str"),
        Prop("key-prefix", "hls", type="str"),
        Prop("region", "us-east-1", type="str"),
        Prop("access-key", None, type="str"),
        Prop("secret-access-key", None, type="str"),
        Prop("session-token", None, type="str"),
        Prop("endpoint-uri", None, type="str"),
        Prop("target-duration", 2_000_000_000, type="uint64"),
        Prop("playlist-length", 5, type="uint"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._client: Optional[S3Client] = None
        self._segment = bytearray()
        self._segments: List[Tuple[str, int]] = []
        self._segment_start: Optional[int] = None
        self._index = 0

    def on_ready_to_paused(self) -> None:
        self._client = _client_from_props(self)
        self._segment = bytearray()
        self._segments = []
        self._segment_start = None
        self._index = 0

    def render(self, buffer: Buffer) -> FlowReturn:
        pts = getattr(buffer, "pts", None)
        if self._segment_start is None:
            self._segment_start = pts if pts is not None else 0
        self._segment += np.asarray(buffer.data, dtype=np.uint8).tobytes()
        target = self.get_property("target-duration")
        if pts is not None and self._segment_start is not None and \
                pts - self._segment_start >= target:
            self._finish_segment(pts - self._segment_start)
            self._segment_start = pts
        return FlowReturn.OK

    def _finish_segment(self, duration_ns: int) -> None:
        if not self._segment:
            return
        prefix = self.get_property("key-prefix").rstrip("/")
        name = f"segment{self._index:05d}.ts"
        self._client.put_object(self.get_property("bucket"), f"{prefix}/{name}",
                                bytes(self._segment), content_type="video/mp2t")
        self._segments.append((name, duration_ns))
        maxlen = self.get_property("playlist-length")
        self._segments = self._segments[-maxlen:]
        self._upload_playlist()
        self._segment = bytearray()
        self._index += 1

    def _upload_playlist(self) -> None:
        target_s = max((d for _, d in self._segments), default=0) / 1e9
        lines = ["#EXTM3U", "#EXT-X-VERSION:3",
                 f"#EXT-X-TARGETDURATION:{int(round(target_s)) or 1}",
                 f"#EXT-X-MEDIA-SEQUENCE:{max(0, self._index + 1 - len(self._segments))}"]
        for name, dur in self._segments:
            lines.append(f"#EXTINF:{dur / 1e9:.3f},")
            lines.append(name)
        prefix = self.get_property("key-prefix").rstrip("/")
        self._client.put_object(
            self.get_property("bucket"), f"{prefix}/playlist.m3u8",
            ("\n".join(lines) + "\n").encode(),
            content_type="application/vnd.apple.mpegurl",
        )

    def on_event(self, event) -> None:
        from ...core.events import EventType

        if event.type == EventType.EOS and self._client is not None and self._segment:
            self._finish_segment(self.get_property("target-duration"))


# ---------------------------------------------------------------------------
# Polly / Translate / Transcribe


def _aws_json_post(el, url: str, target: Optional[str], payload: dict,
                   service: str) -> Tuple[int, bytes]:
    body = json.dumps(payload).encode()
    headers = {"content-type": "application/x-amz-json-1.1"}
    if target:
        headers["x-amz-target"] = target
    signed = sigv4.sign_headers(
        "POST", url, el.get_property("region") or "us-east-1", service,
        el.get_property("access-key") or "anonymous",
        el.get_property("secret-access-key") or "anonymous",
        headers=headers, payload=body,
        session_token=el.get_property("session-token"),
    )
    req = urllib.request.Request(url, data=body, method="POST")
    for k, v in signed.items():
        if k.lower() != "host":
            req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


TEXT_CAPS = Caps.builder("text/x-raw")


@register
class AwsPolly(BaseTransform):
    """Text → synthesized audio via the Polly SynthesizeSpeech REST call."""

    ELEMENT_NAME = "awspolly"
    ELEMENT_CLASS = "Filter/Audio/Text"
    ELEMENT_DESCRIPTION = "Synthesizes speech from text with Amazon Polly"
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = Caps.builder("audio/x-raw")
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("region", "us-east-1", type="str"),
        Prop("access-key", None, type="str"),
        Prop("secret-access-key", None, type="str"),
        Prop("session-token", None, type="str"),
        Prop("endpoint-uri", None, type="str"),
        Prop("voice-id", "Joanna", type="str"),
        Prop("engine", "standard", type="str"),
        Prop("language-code", None, type="str"),
        Prop("sample-rate", 16000, type="int"),
    ]

    def transform_caps(self, direction, caps: Caps, filter_=None) -> Caps:
        from ...core.element import PadDirection

        if direction == PadDirection.SINK:
            rate = self.get_property("sample-rate")
            out = parse_caps(
                f"audio/x-raw,format=S16,rate={rate},channels=1,layout=interleaved")
        else:
            out = TEXT_CAPS
        return out if filter_ is None else out.intersect(filter_)

    def transform(self, buffer: Buffer) -> Buffer:
        text = bytes(np.asarray(buffer.data, np.uint8)).decode("utf-8", "replace")
        endpoint = self.get_property("endpoint-uri") or \
            f"https://polly.{self.get_property('region')}.amazonaws.com"
        payload = {
            "OutputFormat": "pcm",
            "SampleRate": str(self.get_property("sample-rate")),
            "Text": text,
            "VoiceId": self.get_property("voice-id"),
            "Engine": self.get_property("engine"),
        }
        if self.get_property("language-code"):
            payload["LanguageCode"] = self.get_property("language-code")
        status, body = _aws_json_post(self, endpoint.rstrip("/") + "/v1/speech",
                                      None, payload, "polly")
        if status != 200:
            raise RuntimeError(f"polly: HTTP {status}: {body[:200]!r}")
        pcm = np.frombuffer(body, "<i2").reshape(-1, 1)
        out = Buffer(pcm, pts=buffer.pts, duration=buffer.duration)
        return out


@register
class AwsTranslate(BaseTransform):
    """Text → translated text via the Translate TranslateText JSON API."""

    ELEMENT_NAME = "awstranslate"
    ELEMENT_CLASS = "Filter/Text"
    ELEMENT_DESCRIPTION = "Translates text with Amazon Translate"
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("region", "us-east-1", type="str"),
        Prop("access-key", None, type="str"),
        Prop("secret-access-key", None, type="str"),
        Prop("session-token", None, type="str"),
        Prop("endpoint-uri", None, type="str"),
        Prop("input-language-code", "en", type="str"),
        Prop("output-language-code", "es", type="str"),
    ]

    def transform(self, buffer: Buffer) -> Buffer:
        text = bytes(np.asarray(buffer.data, np.uint8)).decode("utf-8", "replace")
        endpoint = self.get_property("endpoint-uri") or \
            f"https://translate.{self.get_property('region')}.amazonaws.com"
        status, body = _aws_json_post(
            self, endpoint.rstrip("/") + "/",
            "AWSShineFrontendService_20170701.TranslateText",
            {
                "Text": text,
                "SourceLanguageCode": self.get_property("input-language-code"),
                "TargetLanguageCode": self.get_property("output-language-code"),
            },
            "translate",
        )
        if status != 200:
            raise RuntimeError(f"translate: HTTP {status}: {body[:200]!r}")
        translated = json.loads(body).get("TranslatedText", "")
        return Buffer(np.frombuffer(translated.encode(), np.uint8),
                      pts=buffer.pts, duration=buffer.duration)


@register
class AwsTranscribeParse(BaseTransform):
    """Parses batch Transcribe result JSON into timed text buffers
    (net/aws/src/transcribe_parse)."""

    ELEMENT_NAME = "awstranscribeparse"
    ELEMENT_CLASS = "Parser/Text"
    ELEMENT_DESCRIPTION = "Parses AWS Transcribe result JSON into timed text"
    SINK_CAPS = Caps.builder("application/x-json")
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._out: List[Buffer] = []

    def generate_output(self) -> Optional[Buffer]:
        inbuf = self.take_queued_buffer()
        if inbuf is not None:
            doc = json.loads(bytes(np.asarray(inbuf.data, np.uint8)).decode())
            for item in doc.get("results", {}).get("items", []):
                if item.get("type") != "pronunciation":
                    continue
                word = item["alternatives"][0]["content"]
                start = int(float(item["start_time"]) * 1e9)
                end = int(float(item["end_time"]) * 1e9)
                self._out.append(Buffer(np.frombuffer(word.encode(), np.uint8),
                                        pts=start, duration=end - start))
        return self._out.pop(0) if self._out else None


@register
class AwsTranscriber2(BaseTransform):
    """Streaming transcription over the Transcribe WebSocket API.

    Audio buffers are wrapped in event-stream AudioEvent messages
    (net/eventstream.py); TranscriptEvent results come back the same way.
    Final (non-partial) results are emitted as text buffers.  The
    endpoint is a SigV4-presigned wss URL in production; `endpoint-uri`
    connects directly for tests.
    """

    ELEMENT_NAME = "awstranscriber2"
    ELEMENT_CLASS = "Filter/Audio/Text"
    ELEMENT_DESCRIPTION = "Streaming speech-to-text with Amazon Transcribe"
    SINK_CAPS = Caps.builder("audio/x-raw")
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("region", "us-east-1", type="str"),
        Prop("access-key", None, type="str"),
        Prop("secret-access-key", None, type="str"),
        Prop("session-token", None, type="str"),
        Prop("endpoint-uri", None, type="str"),
        Prop("language-code", "en-US", type="str"),
        Prop("latency", 2_000_000_000, type="uint64"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._ws = None
        self._results: List[str] = []
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None

    def transform_caps(self, direction, caps: Caps, filter_=None) -> Caps:
        from ...core.element import PadDirection

        out = TEXT_CAPS if direction == PadDirection.SINK else Caps.builder("audio/x-raw")
        return out if filter_ is None else out.intersect(filter_)

    def _connect_url(self) -> str:
        ep = self.get_property("endpoint-uri")
        if ep:
            return ep
        region = self.get_property("region")
        base = f"wss://transcribestreaming.{region}.amazonaws.com:8443/stream-transcription-websocket"
        return sigv4.presign_url(
            "GET", base, region, "transcribe",
            self.get_property("access-key") or "anonymous",
            self.get_property("secret-access-key") or "anonymous",
            session_token=self.get_property("session-token"),
            extra_params={
                "language-code": self.get_property("language-code"),
                "media-encoding": "pcm",
                "sample-rate": "16000",
            },
        )

    def start(self) -> None:
        from websockets.sync.client import connect as ws_connect

        self._ws = ws_connect(self._connect_url(), open_timeout=10)
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._ws is not None:
            from ...net import eventstream

            try:
                # empty AudioEvent signals end of stream
                self._ws.send(eventstream.encode_message(
                    {":message-type": "event", ":event-type": "AudioEvent",
                     ":content-type": "application/octet-stream"}, b""))
                self._ws.close()
            except Exception:
                pass
            self._ws = None

    def _recv_loop(self) -> None:
        from ...net import eventstream

        try:
            for raw in self._ws:
                if isinstance(raw, str):
                    raw = raw.encode()
                headers, payload, _ = eventstream.decode_message(raw)
                if headers.get(":event-type") != "TranscriptEvent":
                    continue
                doc = json.loads(payload)
                for res in doc.get("Transcript", {}).get("Results", []):
                    if res.get("IsPartial"):
                        continue
                    alts = res.get("Alternatives", [])
                    if alts:
                        with self._lock:
                            self._results.append(alts[0].get("Transcript", ""))
        except Exception:
            pass

    def generate_output(self) -> Optional[Buffer]:
        from ...net import eventstream

        inbuf = self.take_queued_buffer()
        if inbuf is not None:
            self._last_pts = inbuf.pts
            pcm = np.asarray(inbuf.data)
            if pcm.dtype != np.int16:
                pcm = (np.clip(np.asarray(pcm, np.float32), -1, 1) * 32767).astype(np.int16)
            self._ws.send(eventstream.encode_message(
                {":message-type": "event", ":event-type": "AudioEvent",
                 ":content-type": "application/octet-stream"},
                pcm.tobytes()))
            import time as _time
            _time.sleep(0.01)  # let the receive thread drain on loopback
        with self._lock:
            if not self._results:
                return None
            text = self._results.pop(0)
        return Buffer(np.frombuffer(text.encode(), np.uint8),
                      pts=getattr(self, "_last_pts", None))


@register
class AwsTranscriber(AwsTranscriber2):
    ELEMENT_NAME = "awstranscriber"
    ELEMENT_DESCRIPTION = "Streaming speech-to-text with Amazon Transcribe (v1 name)"
