// Thin C shim over the system libavcodec for the codec-wrapper elements
// (dav1ddec / rav1enc / ffv1dec / lewtondec analogs).  The reference wraps
// the same C libraries through -sys crates; this is the ctypes-friendly
// equivalent.  Video is exchanged as I420 planes (colorspace conversion
// stays on the TPU side), audio as interleaved f32.
extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
}
#include <cstring>

struct AvShim {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
};

extern "C" {

// w/h are needed by codecs whose dimensions live in the container, not the
// bitstream (ffv1); pass 0 when the bitstream is self-describing.
AvShim* avshim_decoder_new(const char* name, const uint8_t* extradata,
                           int extralen, int w, int h) {
    const AVCodec* codec = avcodec_find_decoder_by_name(name);
    if (!codec) return nullptr;
    AvShim* s = new AvShim();
    s->codec = codec;
    s->ctx = avcodec_alloc_context3(codec);
    if (w > 0) s->ctx->width = w;
    if (h > 0) s->ctx->height = h;
    if (extralen > 0) {
        s->ctx->extradata = (uint8_t*)av_mallocz(extralen + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(s->ctx->extradata, extradata, extralen);
        s->ctx->extradata_size = extralen;
    }
    if (avcodec_open2(s->ctx, codec, nullptr) < 0) { delete s; return nullptr; }
    s->pkt = av_packet_alloc();
    s->frame = av_frame_alloc();
    return s;
}

AvShim* avshim_video_encoder_new(const char* name, int w, int h,
                                 int fps_n, int fps_d, long bitrate,
                                 const char* opts) {
    const AVCodec* codec = avcodec_find_encoder_by_name(name);
    if (!codec) return nullptr;
    AvShim* s = new AvShim();
    s->codec = codec;
    s->ctx = avcodec_alloc_context3(codec);
    s->ctx->width = w;
    s->ctx->height = h;
    s->ctx->time_base = {fps_d, fps_n};
    s->ctx->framerate = {fps_n, fps_d};
    s->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    s->ctx->bit_rate = bitrate;
    s->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;  // extradata out of band
    AVDictionary* d = nullptr;
    // '|' pair separator so values (e.g. rav1e-params) may contain ':'
    if (opts && opts[0]) av_dict_parse_string(&d, opts, "=", "|", 0);
    if (avcodec_open2(s->ctx, codec, &d) < 0) { av_dict_free(&d); delete s; return nullptr; }
    av_dict_free(&d);
    s->pkt = av_packet_alloc();
    s->frame = av_frame_alloc();
    return s;
}

AvShim* avshim_audio_encoder_new(const char* name, int rate, int channels,
                                 long bitrate) {
    const AVCodec* codec = avcodec_find_encoder_by_name(name);
    if (!codec) return nullptr;
    AvShim* s = new AvShim();
    s->codec = codec;
    s->ctx = avcodec_alloc_context3(codec);
    s->ctx->sample_rate = rate;
    av_channel_layout_default(&s->ctx->ch_layout, channels);
    s->ctx->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
    s->ctx->bit_rate = bitrate;
    s->ctx->time_base = {1, rate};
    s->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(s->ctx, codec, nullptr) < 0) { delete s; return nullptr; }
    s->pkt = av_packet_alloc();
    s->frame = av_frame_alloc();
    return s;
}

int avshim_frame_size(AvShim* s) { return s->ctx->frame_size; }

int avshim_extradata(AvShim* s, uint8_t* out, int cap) {
    if (!s->ctx->extradata) return 0;
    if (s->ctx->extradata_size > cap) return -1;
    memcpy(out, s->ctx->extradata, s->ctx->extradata_size);
    return s->ctx->extradata_size;
}

int avshim_send_packet(AvShim* s, const uint8_t* data, int size, long pts) {
    if (data == nullptr) return avcodec_send_packet(s->ctx, nullptr);  // flush
    AVPacket* p = s->pkt;
    av_packet_unref(p);
    if (av_new_packet(p, size) < 0) return -1;
    memcpy(p->data, data, size);
    p->pts = pts;
    return avcodec_send_packet(s->ctx, p);
}

// -> 0 ok; AVERROR(EAGAIN)/-EOF mapped to 1; other errors <0.
int avshim_receive_video(AvShim* s, uint8_t* y, uint8_t* u, uint8_t* v,
                         int* w, int* h, long* pts) {
    int ret = avcodec_receive_frame(s->ctx, s->frame);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 1;
    if (ret < 0) return ret;
    AVFrame* f = s->frame;
    if (f->format != AV_PIX_FMT_YUV420P && f->format != AV_PIX_FMT_YUVJ420P)
        return -1000;  // only I420 exchange supported
    *w = f->width; *h = f->height; *pts = f->pts;
    for (int r = 0; r < f->height; r++)
        memcpy(y + (size_t)r * f->width, f->data[0] + (size_t)r * f->linesize[0], f->width);
    int cw = f->width / 2, ch = f->height / 2;
    for (int r = 0; r < ch; r++) {
        memcpy(u + (size_t)r * cw, f->data[1] + (size_t)r * f->linesize[1], cw);
        memcpy(v + (size_t)r * cw, f->data[2] + (size_t)r * f->linesize[2], cw);
    }
    av_frame_unref(f);
    return 0;
}

int avshim_receive_audio(AvShim* s, float* out, int max_samples,
                         int* nsamples, int* channels, int* rate, long* pts) {
    int ret = avcodec_receive_frame(s->ctx, s->frame);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 1;
    if (ret < 0) return ret;
    AVFrame* f = s->frame;
    int ch = f->ch_layout.nb_channels;
    if (f->nb_samples * ch > max_samples) { av_frame_unref(f); return -2; }
    *nsamples = f->nb_samples; *channels = ch;
    *rate = f->sample_rate; *pts = f->pts;
    if (f->format == AV_SAMPLE_FMT_FLTP) {
        for (int c = 0; c < ch; c++) {
            const float* src = (const float*)f->data[c];
            for (int i = 0; i < f->nb_samples; i++) out[(size_t)i * ch + c] = src[i];
        }
    } else if (f->format == AV_SAMPLE_FMT_FLT) {
        memcpy(out, f->data[0], sizeof(float) * f->nb_samples * ch);
    } else if (f->format == AV_SAMPLE_FMT_S16) {
        const int16_t* src = (const int16_t*)f->data[0];
        for (int i = 0; i < f->nb_samples * ch; i++) out[i] = src[i] / 32768.0f;
    } else if (f->format == AV_SAMPLE_FMT_S16P) {
        for (int c = 0; c < ch; c++) {
            const int16_t* src = (const int16_t*)f->data[c];
            for (int i = 0; i < f->nb_samples; i++)
                out[(size_t)i * ch + c] = src[i] / 32768.0f;
        }
    } else {
        av_frame_unref(f);
        return -1001;
    }
    av_frame_unref(f);
    return 0;
}

int avshim_send_video(AvShim* s, const uint8_t* y, const uint8_t* u,
                      const uint8_t* v, long pts) {
    if (y == nullptr) return avcodec_send_frame(s->ctx, nullptr);
    AVFrame* f = s->frame;
    av_frame_unref(f);
    f->format = AV_PIX_FMT_YUV420P;
    f->width = s->ctx->width;
    f->height = s->ctx->height;
    if (av_frame_get_buffer(f, 0) < 0) return -1;
    for (int r = 0; r < f->height; r++)
        memcpy(f->data[0] + (size_t)r * f->linesize[0], y + (size_t)r * f->width, f->width);
    int cw = f->width / 2, ch = f->height / 2;
    for (int r = 0; r < ch; r++) {
        memcpy(f->data[1] + (size_t)r * f->linesize[1], u + (size_t)r * cw, cw);
        memcpy(f->data[2] + (size_t)r * f->linesize[2], v + (size_t)r * cw, cw);
    }
    f->pts = pts;
    return avcodec_send_frame(s->ctx, f);
}

int avshim_send_audio_f32(AvShim* s, const float* interleaved, int nsamples,
                          long pts) {
    if (interleaved == nullptr) return avcodec_send_frame(s->ctx, nullptr);
    AVFrame* f = s->frame;
    av_frame_unref(f);
    f->format = s->ctx->sample_fmt;
    f->nb_samples = nsamples;
    av_channel_layout_copy(&f->ch_layout, &s->ctx->ch_layout);
    f->sample_rate = s->ctx->sample_rate;
    if (av_frame_get_buffer(f, 0) < 0) return -1;
    int ch = f->ch_layout.nb_channels;
    if (f->format == AV_SAMPLE_FMT_FLTP) {
        for (int c = 0; c < ch; c++) {
            float* dst = (float*)f->data[c];
            for (int i = 0; i < nsamples; i++) dst[i] = interleaved[(size_t)i * ch + c];
        }
    } else if (f->format == AV_SAMPLE_FMT_FLT) {
        memcpy(f->data[0], interleaved, sizeof(float) * nsamples * ch);
    } else if (f->format == AV_SAMPLE_FMT_S16) {
        // mirror of receive_audio's /32768 so n/32768.0f round-trips exactly
        int16_t* dst = (int16_t*)f->data[0];
        for (int i = 0; i < nsamples * ch; i++) {
            float x = interleaved[i] * 32768.0f;
            dst[i] = (int16_t)(x < -32768.f ? -32768 : x > 32767.f ? 32767
                               : lrintf(x));
        }
    } else if (f->format == AV_SAMPLE_FMT_S16P) {
        for (int c = 0; c < ch; c++) {
            int16_t* dst = (int16_t*)f->data[c];
            for (int i = 0; i < nsamples; i++) {
                float x = interleaved[(size_t)i * ch + c] * 32768.0f;
                dst[i] = (int16_t)(x < -32768.f ? -32768 : x > 32767.f ? 32767
                                   : lrintf(x));
            }
        }
    } else {
        return -1001;
    }
    f->pts = pts;
    return avcodec_send_frame(s->ctx, f);
}

// -> packet size, 1 when drained/needs input, <0 error.
int avshim_receive_packet(AvShim* s, uint8_t* out, int cap, long* pts,
                          int* keyframe) {
    int ret = avcodec_receive_packet(s->ctx, s->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 1;
    if (ret < 0) return ret;
    if (s->pkt->size > cap) { av_packet_unref(s->pkt); return -2; }
    memcpy(out, s->pkt->data, s->pkt->size);
    *pts = s->pkt->pts;
    *keyframe = (s->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    int size = s->pkt->size;
    av_packet_unref(s->pkt);
    return size;
}

void avshim_free(AvShim* s) {
    if (!s) return;
    av_packet_free(&s->pkt);
    av_frame_free(&s->frame);
    avcodec_free_context(&s->ctx);
    delete s;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// libavformat demux shim: the EXTERNAL oracle for everything the in-repo
// muxers write (isobmff/mpegts/flv/hls).  The reference's muxers are
// implicitly interop-validated by the wider GStreamer ecosystem
// (mux/isobmff/tests/tests_fmp4.rs drives real decoders); here the system
// ffmpeg demuxers play that role so the byte-layout tests are no longer
// checked only against the same repo's own reader.

extern "C" {
#include <libavformat/avformat.h>
}

struct AvDemux {
    AVFormatContext* fmt = nullptr;
    AVPacket* pkt = nullptr;
};

extern "C" {

// Open a container file with full probing. Returns nullptr on failure.
AvDemux* avdemux_open(const char* path) {
    AvDemux* d = new AvDemux();
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    return d;
}

// Detected demuxer short name ("mov,mp4,m4a,..." / "mpegts" / "flv").
int avdemux_format_name(AvDemux* d, char* out, int cap) {
    if (!d || !d->fmt || !d->fmt->iformat) return -1;
    snprintf(out, cap, "%s", d->fmt->iformat->name);
    return 0;
}

int avdemux_nb_streams(AvDemux* d) {
    return d && d->fmt ? (int)d->fmt->nb_streams : -1;
}

long avdemux_duration(AvDemux* d) {  // in AV_TIME_BASE (us)
    return d && d->fmt ? (long)d->fmt->duration : -1;
}

// Per-stream info: codec name, type (0 video / 1 audio / other), geometry,
// rate/channels, time_base, and extradata.
int avdemux_stream_info(AvDemux* d, int idx, char* codec_name, int name_cap,
                        int* codec_type, int* width, int* height,
                        int* sample_rate, int* channels,
                        int* tb_num, int* tb_den,
                        uint8_t* extradata, int extradata_cap,
                        int* extradata_len) {
    if (!d || idx < 0 || idx >= (int)d->fmt->nb_streams) return -1;
    AVStream* st = d->fmt->streams[idx];
    AVCodecParameters* par = st->codecpar;
    const char* cname = avcodec_get_name(par->codec_id);
    snprintf(codec_name, name_cap, "%s", cname ? cname : "?");
    *codec_type = par->codec_type == AVMEDIA_TYPE_VIDEO ? 0
                : par->codec_type == AVMEDIA_TYPE_AUDIO ? 1 : 2;
    *width = par->width;
    *height = par->height;
    *sample_rate = par->sample_rate;
    *channels = par->ch_layout.nb_channels;
    *tb_num = st->time_base.num;
    *tb_den = st->time_base.den;
    *extradata_len = par->extradata_size;
    if (par->extradata && par->extradata_size > 0 &&
        par->extradata_size <= extradata_cap)
        memcpy(extradata, par->extradata, par->extradata_size);
    return 0;
}

// Per-stream language metadata tag (empty if unset).
int avdemux_stream_language(AvDemux* d, int idx, char* out, int cap) {
    if (!d || idx < 0 || idx >= (int)d->fmt->nb_streams) return -1;
    AVDictionaryEntry* e =
        av_dict_get(d->fmt->streams[idx]->metadata, "language", nullptr, 0);
    snprintf(out, cap, "%s", e ? e->value : "");
    return 0;
}

// Read the next packet. Returns payload size, -1 at EOF, <-1 on error;
// -2 when the packet exceeds `cap` (caller retries with a bigger buffer —
// *size is still filled with the needed capacity).
int avdemux_read(AvDemux* d, int* stream_index, long* pts, long* dts,
                 long* duration, int* keyframe, uint8_t* out, int cap,
                 int* size) {
    int ret = av_read_frame(d->fmt, d->pkt);
    if (ret == AVERROR_EOF) return -1;
    if (ret < 0) return -3;
    *stream_index = d->pkt->stream_index;
    *pts = d->pkt->pts;
    *dts = d->pkt->dts;
    *duration = d->pkt->duration;
    *keyframe = (d->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    *size = d->pkt->size;
    if (d->pkt->size > cap) {
        av_packet_unref(d->pkt);
        return -2;
    }
    memcpy(out, d->pkt->data, d->pkt->size);
    int sz = d->pkt->size;
    av_packet_unref(d->pkt);
    return sz;
}

void avdemux_close(AvDemux* d) {
    if (!d) return;
    av_packet_free(&d->pkt);
    avformat_close_input(&d->fmt);
    delete d;
}

}  // extern "C"
