/* Test-only oracle shim around libavcodec's H.264 codec pair.
 *
 * Role: the differential-test oracle for libheif_tpu's from-scratch AVC
 * codec core (the reference obtains AVC from openh264/x264 plugins,
 * reference: libheif/plugins/decoder_openh264.cc, encoder_x264.cc).
 *
 * Built on demand by tests/avc_oracle.py:
 *   gcc -O2 -shared -fPIC avc_shim.c -lavcodec -lavutil -o libavcshim.so
 */

#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <string.h>

/* Decode the first frame of an annex-B H.264 stream into planar
 * YUV420 (or gray). Returns total bytes written to out, or -err. */
static int g_debug = 0;
void avc_set_debug(int d) { g_debug = d; }

int avc_decode(const uint8_t *buf, int len, uint8_t *out, int out_cap,
               int *w, int *h, int *is_mono) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->debug = g_debug;
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    uint8_t *padded = av_malloc(len + AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(padded, buf, len);
    memset(padded + len, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    pkt->data = padded; pkt->size = len;
    int ret = -4;
    if (avcodec_send_packet(ctx, pkt) >= 0 ||
        1 /* some streams need flush */) {
        avcodec_send_packet(ctx, NULL);  /* flush */
        if (avcodec_receive_frame(ctx, frame) >= 0) {
            *w = frame->width; *h = frame->height;
            int mono = (frame->format == AV_PIX_FMT_GRAY8);
            *is_mono = mono;
            int cw = (frame->width + 1) / 2, ch = (frame->height + 1) / 2;
            int need = frame->width * frame->height + (mono ? 0 : 2 * cw * ch);
            if (need <= out_cap) {
                uint8_t *p = out;
                for (int r = 0; r < frame->height; r++, p += frame->width)
                    memcpy(p, frame->data[0] + r * frame->linesize[0], frame->width);
                if (!mono) {
                    for (int pl = 1; pl <= 2; pl++)
                        for (int r = 0; r < ch; r++, p += cw)
                            memcpy(p, frame->data[pl] + r * frame->linesize[pl], cw);
                }
                ret = need;
            } else ret = -5;
        }
    }
    av_free(padded);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return ret;
}

/* Encode one planar YUV420 frame as an H.264 intra frame via libx264.
 * opts: colon-separated x264-params string (may be empty).
 * Returns annex-B byte count written to out, or -err. */
int avc_encode(const uint8_t *yuv, int w, int h, int qp, int cabac,
               int tx8, const char *extra_params,
               uint8_t *out, int out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_H264);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->width = w; ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, 25};
    ctx->gop_size = 1;          /* all intra */
    ctx->max_b_frames = 0;
    ctx->thread_count = 1;
    char params[512];
    snprintf(params, sizeof params,
             "qp=%d:cabac=%d:8x8dct=%d:keyint=1:scenecut=0:ref=1:"
             "bframes=0:weightp=0:threads=1:sliced-threads=0%s%s",
             qp, cabac, tx8,
             extra_params && extra_params[0] ? ":" : "",
             extra_params ? extra_params : "");
    av_opt_set(ctx->priv_data, "x264-params", params, 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt;
    frame->width = w; frame->height = h;
    av_frame_get_buffer(frame, 0);
    int cw = (w + 1) / 2, ch = (h + 1) / 2;
    const uint8_t *p = yuv;
    for (int r = 0; r < h; r++, p += w)
        memcpy(frame->data[0] + r * frame->linesize[0], p, w);
    for (int pl = 1; pl <= 2; pl++)
        for (int r = 0; r < ch; r++, p += cw)
            memcpy(frame->data[pl] + r * frame->linesize[pl], p, cw);
    frame->pts = 0;

    AVPacket *pkt = av_packet_alloc();
    int total = -4;
    if (avcodec_send_frame(ctx, frame) >= 0) {
        avcodec_send_frame(ctx, NULL);
        total = 0;
        while (avcodec_receive_packet(ctx, pkt) >= 0) {
            if (total + pkt->size <= out_cap) {
                memcpy(out + total, pkt->data, pkt->size);
                total += pkt->size;
            } else { total = -5; break; }
            av_packet_unref(pkt);
        }
        /* prepend SPS/PPS from extradata if packets lack them
         * (global_header off by default for raw H.264 → in-band) */
    }
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return total;
}

/* Encode nframes of planar YUV420 as an IPPP sequence (CQP, flat).
 * Tool constraints come through extra_params (x264-params syntax).
 * Returns annex-B byte count, or -err. */
int avc_encode_seq(const uint8_t *yuv, int nframes, int w, int h,
                   int qp, int gop, const char *extra_params,
                   uint8_t *out, int out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->width = w; ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, 25};
    ctx->gop_size = gop;
    ctx->max_b_frames = 0;
    ctx->thread_count = 1;
    char params[512];
    snprintf(params, sizeof params,
             "qp=%d:cabac=1:8x8dct=0:keyint=%d:min-keyint=%d:scenecut=0:"
             "ref=1:bframes=0:weightp=0:threads=1:sliced-threads=0:"
             "aq-mode=0:mixed-refs=0%s%s",
             qp, gop, gop,
             extra_params && extra_params[0] ? ":" : "",
             extra_params ? extra_params : "");
    av_opt_set(ctx->priv_data, "x264-params", params, 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt;
    frame->width = w; frame->height = h;
    av_frame_get_buffer(frame, 0);
    int cw = (w + 1) / 2, ch = (h + 1) / 2;
    size_t fsz = (size_t)w * h + 2 * (size_t)cw * ch;
    AVPacket *pkt = av_packet_alloc();
    int total = 0;
    for (int f = 0; f < nframes && total >= 0; f++) {
        const uint8_t *p = yuv + f * fsz;
        av_frame_make_writable(frame);
        for (int r = 0; r < h; r++, p += w)
            memcpy(frame->data[0] + r * frame->linesize[0], p, w);
        for (int pl = 1; pl <= 2; pl++)
            for (int r = 0; r < ch; r++, p += cw)
                memcpy(frame->data[pl] + r * frame->linesize[pl], p, cw);
        frame->pts = f;
        if (avcodec_send_frame(ctx, frame) < 0) { total = -4; break; }
        while (avcodec_receive_packet(ctx, pkt) >= 0) {
            if (total + pkt->size <= out_cap) {
                memcpy(out + total, pkt->data, pkt->size);
                total += pkt->size;
            } else total = -5;
            av_packet_unref(pkt);
        }
    }
    if (total >= 0) {
        avcodec_send_frame(ctx, NULL);
        while (avcodec_receive_packet(ctx, pkt) >= 0) {
            if (total + pkt->size <= out_cap) {
                memcpy(out + total, pkt->data, pkt->size);
                total += pkt->size;
            } else total = -5;
            av_packet_unref(pkt);
        }
    }
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return total;
}

/* Decode every frame of an annex-B stream; planes written
 * back-to-back in output order. Returns total bytes, or -err;
 * *nframes_out = frame count. */
int avc_decode_seq(const uint8_t *buf, int len, uint8_t *out,
                   int out_cap, int *w, int *h, int *nframes_out) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->thread_count = 1;
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    uint8_t *padded = av_malloc(len + AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(padded, buf, len);
    memset(padded + len, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    /* split into access units: one packet per VCL NAL (with any
     * preceding non-VCL NALs attached), so multi-frame annex-B
     * streams decode frame by frame */
    int total = 0, n = 0;
    {
        int au_start = 0, i = 0;
        while (i + 3 <= len) {
            if (!(padded[i] == 0 && padded[i+1] == 0 && padded[i+2] == 1)) {
                i++;
                continue;
            }
            int nal_start = i + 3;
            int t = padded[nal_start] & 0x1F;
            /* find next start code */
            int j = nal_start;
            while (j + 3 <= len &&
                   !(padded[j] == 0 && padded[j+1] == 0 && padded[j+2] == 1))
                j++;
            int nal_end = (j + 3 <= len) ? j : len;
            if (t == 1 || t == 5) {
                pkt->data = padded + au_start;
                pkt->size = nal_end - au_start;
                avcodec_send_packet(ctx, pkt);
                while (avcodec_receive_frame(ctx, frame) >= 0) {
                    int W = frame->width, Hh = frame->height;
                    int cw = (W + 1) / 2, ch = (Hh + 1) / 2;
                    int need = W * Hh + 2 * cw * ch;
                    if (total + need > out_cap) { total = -5; break; }
                    uint8_t *p = out + total;
                    for (int r = 0; r < Hh; r++, p += W)
                        memcpy(p, frame->data[0] + r * frame->linesize[0], W);
                    for (int pl = 1; pl <= 2; pl++)
                        for (int r = 0; r < ch; r++, p += cw)
                            memcpy(p, frame->data[pl] + r * frame->linesize[pl], cw);
                    *w = W; *h = Hh;
                    total += need; n++;
                }
                au_start = nal_end;
            }
            i = nal_end;
        }
    }
    avcodec_send_packet(ctx, NULL);
    while (avcodec_receive_frame(ctx, frame) >= 0 && total >= 0) {
        *w = frame->width; *h = frame->height;
        int cw = (frame->width + 1) / 2, ch = (frame->height + 1) / 2;
        int need = frame->width * frame->height + 2 * cw * ch;
        if (total + need > out_cap) { total = -5; break; }
        uint8_t *p = out + total;
        for (int r = 0; r < frame->height; r++, p += frame->width)
            memcpy(p, frame->data[0] + r * frame->linesize[0], frame->width);
        for (int pl = 1; pl <= 2; pl++)
            for (int r = 0; r < ch; r++, p += cw)
                memcpy(p, frame->data[pl] + r * frame->linesize[pl], cw);
        total += need;
        n++;
    }
    *nframes_out = n;
    av_free(padded);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return total;
}
