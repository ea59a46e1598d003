"""Speech-service elements: deepgramtranscriber, speechmaticstranscriber,
elevenlabssynthesizer, elevenlabsvoicecloner, llamacpp-texttransform.

Parity targets: net/deepgram (WS listen API: binary PCM in, Results JSON
out), audio/speechmatics (RT API v2: StartRecognition/AddTranscript/
EndOfStream JSON + binary AddAudio), audio/elevenlabs (stream-input WS
TTS + /v1/voices/add cloner), text/llamacpp (local-LLM text transform —
backed here by `transformers` since llama.cpp is not in this image;
model gated by `model-path` exactly like whispertranscriber).

All service elements accept an `endpoint-uri`-style override (`url`)
so tests run against in-process fake servers; production uses the
real endpoints with the same code.
"""
from __future__ import annotations

import base64
import json
import queue
import threading
import uuid
from typing import List, Optional

import numpy as np

from ...core import (
    BaseSink,
    BaseTransform,
    Buffer,
    Caps,
    FlowReturn,
    Message,
    MessageType,
    Prop,
    register,
)
from ...core.basetransform import TransformMode
from ...core.parse import parse_caps

TEXT_CAPS = Caps.builder("text/x-raw")
S16_CAPS = "audio/x-raw,format=S16,rate=%d,channels=1,layout=interleaved"


class _WsTranscriberBase(BaseTransform):
    """Shared shape: S16 audio in, final transcripts out as text buffers."""

    SINK_CAPS = Caps.builder("audio/x-raw")
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._ws = None
        self._results: List[str] = []
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._last_pts: Optional[int] = None

    def transform_caps(self, direction, caps: Caps, filter_=None) -> Caps:
        from ...core.element import PadDirection

        out = TEXT_CAPS if direction == PadDirection.SINK else Caps.builder("audio/x-raw")
        return out if filter_ is None else out.intersect(filter_)

    def _push_result(self, text: str) -> None:
        if text:
            with self._lock:
                self._results.append(text)

    def _audio_bytes(self, buf: Buffer) -> bytes:
        pcm = np.asarray(buf.data)
        if pcm.dtype != np.int16:
            pcm = (np.clip(np.asarray(pcm, np.float32), -1, 1) * 32767).astype(np.int16)
        return pcm.tobytes()

    def generate_output(self) -> Optional[Buffer]:
        inbuf = self.take_queued_buffer()
        if inbuf is not None:
            self._last_pts = inbuf.pts
            self._send_audio(self._audio_bytes(inbuf))
            import time
            time.sleep(0.01)
        with self._lock:
            if not self._results:
                return None
            text = self._results.pop(0)
        return Buffer(np.frombuffer(text.encode(), np.uint8), pts=self._last_pts)

    def _send_audio(self, pcm: bytes) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        if self._ws is not None:
            try:
                self._close_stream()
                self._ws.close()
            except Exception:
                pass
            self._ws = None

    def _close_stream(self) -> None:
        pass


@register
class DeepgramTranscriber(_WsTranscriberBase):
    """Deepgram live-transcription WebSocket (net/deepgram/src/transcriber).

    Binary linear16 PCM frames in; `{"type": "Results", "channel":
    {"alternatives": [...]}, "is_final": bool}` JSON out; CloseStream on
    EOS.  `Authorization: Token <api-key>` header."""

    ELEMENT_NAME = "deepgramtranscriber"
    ELEMENT_CLASS = "Filter/Audio/Text"
    ELEMENT_DESCRIPTION = "Streaming speech-to-text via the Deepgram API"
    PROPERTIES = [
        Prop("api-key", None, type="str"),
        Prop("url", "wss://api.deepgram.com/v1/listen", type="str"),
        Prop("language", "en", type="str"),
        Prop("model", "nova-2", type="str"),
        Prop("sample-rate", 16000, type="int"),
        Prop("interim-results", False, type="bool"),
    ]

    def start(self) -> None:
        from websockets.sync.client import connect as ws_connect

        url = self.get_property("url")
        sep = "&" if "?" in url else "?"
        url = (f"{url}{sep}encoding=linear16"
               f"&sample_rate={self.get_property('sample-rate')}"
               f"&language={self.get_property('language')}"
               f"&model={self.get_property('model')}")
        headers = {}
        if self.get_property("api-key"):
            headers["Authorization"] = f"Token {self.get_property('api-key')}"
        self._ws = ws_connect(url, additional_headers=headers, open_timeout=10)
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def _recv_loop(self) -> None:
        try:
            for raw in self._ws:
                msg = json.loads(raw)
                if msg.get("type") != "Results":
                    continue
                if not msg.get("is_final") and not self.get_property("interim-results"):
                    continue
                alts = msg.get("channel", {}).get("alternatives", [])
                if alts:
                    self._push_result(alts[0].get("transcript", ""))
        except Exception:
            pass

    def _send_audio(self, pcm: bytes) -> None:
        self._ws.send(pcm)

    def _close_stream(self) -> None:
        self._ws.send(json.dumps({"type": "CloseStream"}))


@register
class SpeechmaticsTranscriber(_WsTranscriberBase):
    """Speechmatics RT API v2 (audio/speechmatics/src/transcriber/imp.rs:
    StartRecognition with raw/pcm_s16le audio_format, binary AddAudio
    frames, AddTranscript results, EndOfStream with last_seq_no)."""

    ELEMENT_NAME = "speechmaticstranscriber"
    ELEMENT_CLASS = "Filter/Audio/Text"
    ELEMENT_DESCRIPTION = "Streaming speech-to-text via the Speechmatics RT API"
    PROPERTIES = [
        Prop("api-key", None, type="str"),
        Prop("url", "wss://eu2.rt.speechmatics.com/v2", type="str"),
        Prop("language-code", "en", type="str"),
        Prop("sample-rate", 16000, type="int"),
        Prop("max-delay", 3.0, type="float"),
        Prop("enable-late-punctuation-hack", True, type="bool"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._seq = 0
        self._started = threading.Event()
        self._eot = threading.Event()

    def start(self) -> None:
        from websockets.sync.client import connect as ws_connect

        headers = {}
        if self.get_property("api-key"):
            headers["Authorization"] = f"Bearer {self.get_property('api-key')}"
        self._ws = ws_connect(self.get_property("url"),
                              additional_headers=headers, open_timeout=10)
        self._seq = 0
        self._started.clear()
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()
        self._ws.send(json.dumps({
            "message": "StartRecognition",
            "audio_format": {
                "type": "raw",
                "encoding": "pcm_s16le",
                "sample_rate": self.get_property("sample-rate"),
            },
            "transcription_config": {
                "language": self.get_property("language-code"),
                "max_delay": self.get_property("max-delay"),
                "enable_partials": False,
            },
            "translation_config": {"target_languages": []},
        }))
        if not self._started.wait(10.0):
            raise RuntimeError(f"{self.name}: RecognitionStarted never arrived")

    def _recv_loop(self) -> None:
        try:
            for raw in self._ws:
                msg = json.loads(raw)
                kind = msg.get("message")
                if kind == "RecognitionStarted":
                    self._started.set()
                elif kind == "AddTranscript":
                    words = []
                    for res in msg.get("results", []):
                        alts = res.get("alternatives", [])
                        if alts:
                            words.append(alts[0].get("content", ""))
                    self._push_result(" ".join(w for w in words if w))
                elif kind == "EndOfTranscript":
                    self._eot.set()
                elif kind == "Error":
                    self._started.set()
                    self._eot.set()
        except Exception:
            pass
        finally:
            self._eot.set()

    def _send_audio(self, pcm: bytes) -> None:
        self._ws.send(pcm)  # binary frame = AddAudio
        self._seq += 1

    def _close_stream(self) -> None:
        # like the reference, wait for EndOfTranscript so the final
        # AddTranscript results flush before EOS propagates downstream
        self._eot.clear()
        self._ws.send(json.dumps({"message": "EndOfStream", "last_seq_no": self._seq}))
        self._eot.wait(5.0)


@register
class ElevenLabsSynthesizer(BaseTransform):
    """ElevenLabs stream-input TTS WebSocket (audio/elevenlabs/src/
    synthesizer): text chunks in, base64 PCM out."""

    ELEMENT_NAME = "elevenlabssynthesizer"
    ELEMENT_CLASS = "Filter/Text/Audio"
    ELEMENT_DESCRIPTION = "Text-to-speech via the ElevenLabs streaming API"
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = Caps.builder("audio/x-raw")
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("api-key", None, type="str"),
        Prop("voice-id", "21m00Tcm4TlvDq8ikWAM", type="str"),
        Prop("model-id", "eleven_flash_v2_5", type="str"),
        Prop("url", None, type="str", doc="override the wss endpoint (tests)"),
        Prop("sample-rate", 16000, type="int"),
        Prop("stability", 0.5, type="float"),
        Prop("similarity-boost", 0.75, type="float"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._ws = None
        self._audio: "queue.Queue[bytes]" = queue.Queue()
        self._thread = None
        self._last_pts = None

    def transform_caps(self, direction, caps: Caps, filter_=None) -> Caps:
        from ...core.element import PadDirection

        if direction == PadDirection.SINK:
            out = parse_caps(S16_CAPS % self.get_property("sample-rate"))
        else:
            out = TEXT_CAPS
        return out if filter_ is None else out.intersect(filter_)

    def start(self) -> None:
        from websockets.sync.client import connect as ws_connect

        url = self.get_property("url") or (
            f"wss://api.elevenlabs.io/v1/text-to-speech/"
            f"{self.get_property('voice-id')}/stream-input"
            f"?model_id={self.get_property('model-id')}"
            f"&output_format=pcm_{self.get_property('sample-rate')}"
        )
        self._ws = ws_connect(url, open_timeout=10)
        init = {
            "text": " ",
            "voice_settings": {
                "stability": self.get_property("stability"),
                "similarity_boost": self.get_property("similarity-boost"),
            },
        }
        if self.get_property("api-key"):
            init["xi_api_key"] = self.get_property("api-key")
        self._ws.send(json.dumps(init))
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._ws is not None:
            try:
                self._ws.send(json.dumps({"text": ""}))  # flush/end
                self._ws.close()
            except Exception:
                pass
            self._ws = None

    def _recv_loop(self) -> None:
        try:
            for raw in self._ws:
                msg = json.loads(raw)
                if msg.get("audio"):
                    self._audio.put(base64.b64decode(msg["audio"]))
        except Exception:
            pass

    def generate_output(self) -> Optional[Buffer]:
        inbuf = self.take_queued_buffer()
        if inbuf is not None:
            self._last_pts = inbuf.pts
            text = bytes(np.asarray(inbuf.data, np.uint8)).decode("utf-8", "replace")
            self._ws.send(json.dumps({"text": text, "try_trigger_generation": True}))
            import time
            time.sleep(0.01)
        try:
            pcm = self._audio.get_nowait()
        except queue.Empty:
            return None
        return Buffer(np.frombuffer(pcm, "<i2").reshape(-1, 1), pts=self._last_pts)


@register
class ElevenLabsVoiceCloner(BaseSink):
    """Collects audio and POSTs it to /v1/voices/add on EOS
    (audio/elevenlabs/src/cloner); posts an element message with the
    created voice-id."""

    ELEMENT_NAME = "elevenlabsvoicecloner"
    ELEMENT_CLASS = "Sink/Audio"
    ELEMENT_DESCRIPTION = "Clones a voice via the ElevenLabs API"
    SINK_CAPS = Caps.builder("audio/x-raw")
    PROPERTIES = [
        Prop("api-key", None, type="str"),
        Prop("url", "https://api.elevenlabs.io", type="str"),
        Prop("voice-name", "gstpu-voice", type="str"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._audio = bytearray()
        self.voice_id: Optional[str] = None

    def on_ready_to_paused(self) -> None:
        self._audio = bytearray()
        self.voice_id = None

    def render(self, buffer: Buffer) -> FlowReturn:
        pcm = np.asarray(buffer.data)
        if pcm.dtype != np.int16:
            pcm = (np.clip(np.asarray(pcm, np.float32), -1, 1) * 32767).astype(np.int16)
        self._audio += pcm.tobytes()
        return FlowReturn.OK

    def on_event(self, event) -> None:
        from ...core.events import EventType

        if event.type != EventType.EOS or not self._audio:
            return
        import urllib.request

        boundary = uuid.uuid4().hex
        name = self.get_property("voice-name")
        body = bytearray()
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="name"\r\n\r\n{name}\r\n').encode()
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="files"; filename="sample.raw"\r\n'
                 "Content-Type: application/octet-stream\r\n\r\n").encode()
        body += self._audio
        body += f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            self.get_property("url").rstrip("/") + "/v1/voices/add",
            data=bytes(body), method="POST")
        req.add_header("Content-Type", f"multipart/form-data; boundary={boundary}")
        if self.get_property("api-key"):
            req.add_header("xi-api-key", self.get_property("api-key"))
        with urllib.request.urlopen(req, timeout=30) as resp:
            result = json.loads(resp.read())
        self.voice_id = result.get("voice_id")
        self.post_message(Message(MessageType.ELEMENT, name="voice-cloned",
                                  voice_id=self.voice_id))


@register
class LlamaCppTextTransform(BaseTransform):
    """Local-LLM text transform (text/llamacpp llamacpp-texttransform).

    The reference embeds llama.cpp; this environment has no libllama, so
    the element runs any local causal-LM through `transformers`
    (model-path gated exactly like whispertranscriber — wiring is tested
    with a trivial echo fallback when allow-echo-fallback is set)."""

    ELEMENT_NAME = "llamacpp-texttransform"
    ELEMENT_CLASS = "Filter/Text"
    ELEMENT_DESCRIPTION = "Transforms text through a local LLM"
    SINK_CAPS = TEXT_CAPS
    SRC_CAPS = TEXT_CAPS
    MODE = TransformMode.NEVER_IN_PLACE
    PROPERTIES = [
        Prop("model-path", None, type="str", doc="local transformers model dir"),
        Prop("prompt-format", "{system}\n{input}", type="str"),
        Prop("system-prompt", "", type="str"),
        Prop("max-tokens", 64, type="int"),
        Prop("allow-echo-fallback", False, type="bool",
             doc="wiring tests: pass text through uppercased when no model"),
    ]

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self._model = None
        self._tokenizer = None

    def start(self) -> None:
        path = self.get_property("model-path")
        if path:
            from transformers import AutoModelForCausalLM, AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(path)
            self._model = AutoModelForCausalLM.from_pretrained(path)
        elif not self.get_property("allow-echo-fallback"):
            raise RuntimeError(
                f"{self.name}: set model-path to a local causal LM "
                "(or allow-echo-fallback for wiring tests)")

    def transform(self, buffer: Buffer) -> Buffer:
        text = bytes(np.asarray(buffer.data, np.uint8)).decode("utf-8", "replace")
        prompt = self.get_property("prompt-format").format(
            system=self.get_property("system-prompt"), input=text)
        if self._model is None:
            out_text = text.upper()  # documented echo fallback
        else:
            import torch

            ids = self._tokenizer(prompt, return_tensors="pt").input_ids
            with torch.no_grad():
                out = self._model.generate(
                    ids, max_new_tokens=self.get_property("max-tokens"),
                    do_sample=False)
            out_text = self._tokenizer.decode(out[0][ids.shape[1]:],
                                              skip_special_tokens=True)
        return Buffer(np.frombuffer(out_text.encode(), np.uint8),
                      pts=buffer.pts, duration=buffer.duration)
