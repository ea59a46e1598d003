"""Element library. Importing this package registers all elements."""
from . import sinks, sources  # noqa: F401
from .audiofx import (  # noqa: F401
    agingradio,
    audioecho,
    claxondec,
    demucs as demucs_element,
    audioloudnorm,
    audiomixer,
    audiornnoise,
    ebur128level,
    hrtfrender,
    loudnormbank,
    lewtondec,
    sofalizer,
    whisper as whisper_element,
)
from .analytics import combiner, handdetection, meta, onvif as analytics_onvif, yoloxinference, yoloxtensordec  # noqa: F401
from .generic import basic, buffers, convert, corefx, debugsei, decodebin, gopbuffer, io, misc, sodium, threadshare_extra  # noqa: F401
from .mux import flv, isobmff, tsmux  # noqa: F401
from .net import codecs as net_codecs, rtppay, udp  # noqa: F401
from .image import cdg as image_cdg, codecs as image_codecs, overlay as image_overlay  # noqa: F401
from .cc import elements as cc_elements, files as cc_files, overlay as cc_overlay  # noqa: F401
from .text import elements as text_elements  # noqa: F401
from .utilsfx import fallbacksrc, switching  # noqa: F401
from .video import avcodecs, colordetect, colorlut, compositor, hsv, roundedcorners, videocompare, videoscale  # noqa: F401
