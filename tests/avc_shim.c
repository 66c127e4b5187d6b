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
