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
