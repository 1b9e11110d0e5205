// Native video decode stage for the TPU-native Efficient-SlowFast framework.
//
// Replaces the reference's PyAV (Cython/FFmpeg) decode path
// (reference: slowfast/datasets/video_container.py:7-29 and
// slowfast/datasets/decoder.py:150-354) with a C++ library exposed over a
// C ABI for ctypes:
//
//  - selective decode: seek to the clip window's start pts with the same
//    1024-pts margin as pyav_decode_stream (decoder.py:168-189), decode and
//    keep only frames whose pts fall in [start_pts, end_pts];
//  - clip window selection replicates get_start_end_idx + pyav_decode
//    (decoder.py:55-83, :287-354): clip_size = sampling_rate * num_frames /
//    target_fps * fps; random (caller-supplied uniform) or uniformly-spaced
//    test clips;
//  - linspace temporal sampling to num_frames (decoder.py:35-52);
//  - swscale bilinear short-side resize + RGB24 conversion, writing frames
//    into a caller-provided right-padded canvas (short, max_width).
//
// Also provides a tiny mpeg4 encoder (esf_write_test_video) so unit tests can
// synthesize fixture media without external tools.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Frame {
    int64_t pts;
    AVFrame* frame;
};

struct DecodeCtx {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    int stream_idx = -1;

    ~DecodeCtx() {
        if (dec) avcodec_free_context(&dec);
        if (fmt) avformat_close_input(&fmt);
    }
};

int open_video(const char* path, int multi_thread, DecodeCtx* ctx) {
    if (avformat_open_input(&ctx->fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(ctx->fmt, nullptr) < 0) return -2;
    ctx->stream_idx = av_find_best_stream(ctx->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                          nullptr, 0);
    if (ctx->stream_idx < 0) return -3;
    AVStream* st = ctx->fmt->streams[ctx->stream_idx];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) return -4;
    ctx->dec = avcodec_alloc_context3(codec);
    if (!ctx->dec) return -5;
    if (avcodec_parameters_to_context(ctx->dec, st->codecpar) < 0) return -6;
    if (multi_thread) {
        // PyAV's thread_type="AUTO" equivalent (video_container.py:23-27)
        ctx->dec->thread_count = 0;
        ctx->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    }
    if (avcodec_open2(ctx->dec, codec, nullptr) < 0) return -7;
    return 0;
}

// Decode every frame with pts in [start_pts, end_pts] after seeking with the
// reference's margin (decoder.py:168-189). Frames returned sorted by pts.
int decode_window(DecodeCtx* ctx, int64_t start_pts, int64_t end_pts,
                  int64_t margin, std::vector<Frame>* out) {
    int64_t seek_target = std::max<int64_t>(start_pts - margin, 0);
    av_seek_frame(ctx->fmt, ctx->stream_idx, seek_target, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(ctx->dec);

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frm = av_frame_alloc();
    bool done = false;
    int max_margin_overrun = 0;
    while (!done) {
        int r = av_read_frame(ctx->fmt, pkt);
        bool eof_input = (r < 0);
        if (!eof_input && pkt->stream_index != ctx->stream_idx) {
            av_packet_unref(pkt);
            continue;
        }
        if (avcodec_send_packet(ctx->dec, eof_input ? nullptr : pkt) < 0 &&
            !eof_input) {
            av_packet_unref(pkt);
            continue;
        }
        av_packet_unref(pkt);
        while (true) {
            int rr = avcodec_receive_frame(ctx->dec, frm);
            if (rr == AVERROR(EAGAIN)) break;
            if (rr == AVERROR_EOF) { done = true; break; }
            if (rr < 0) { done = true; break; }
            int64_t pts = frm->best_effort_timestamp;
            if (pts == AV_NOPTS_VALUE) pts = frm->pts;
            if (pts > end_pts) {
                // a little overrun keeps b-frame reordering safe, then stop
                if (++max_margin_overrun > 8) { done = true; }
            }
            if (pts >= start_pts && pts <= end_pts) {
                Frame f;
                f.pts = pts;
                f.frame = av_frame_clone(frm);
                out->push_back(f);
            }
            av_frame_unref(frm);
        }
        if (eof_input) break;
    }
    av_packet_free(&pkt);
    av_frame_free(&frm);
    std::sort(out->begin(), out->end(),
              [](const Frame& a, const Frame& b) { return a.pts < b.pts; });
    return out->empty() ? -1 : 0;
}

}  // namespace

extern "C" {

// Decode one clip. Returns 0 on success, negative error code otherwise.
//   path          video file
//   num_frames    frames to return (after linspace sampling)
//   sampling_rate, target_fps  reference clip-window params
//   clip_idx      -1 = random window (uses random01), else test clip index
//   num_clips     number of uniformly spaced test clips
//   random01      uniform sample in [0,1) used when clip_idx == -1
//   short_side    output short side (swscale bilinear)
//   max_width     output canvas width; wider content is center-cropped
//   multi_thread  enable frame/slice threading
//   out           buffer of num_frames * short_side * max_width * 3 bytes
//   out_width     receives the true content width (<= max_width)
//   keep_tall     (clip2) when nonzero, portrait (h > w) content is written
//                 TRANSPOSED into the landscape canvas instead of being
//                 center-cropped square: canvas rows = source columns
//                 (short side), canvas cols = source rows (vertical extent,
//                 center-cropped to max_width). The Python wrapper swaps the
//                 axes back (a zero-copy view) so callers always receive
//                 frames in natural orientation — this preserves the full
//                 vertical extent the reference's 3-position tall-video test
//                 protocol needs (slowfast/datasets/transform.py:425-468).
//   out_portrait  (clip2) receives 1 when the transposed path was taken
int esf_decode_clip2(const char* path, int num_frames, double sampling_rate,
                     double target_fps, int clip_idx, int num_clips,
                     double random01, int short_side, int max_width,
                     int multi_thread, int keep_tall, unsigned char* out,
                     int* out_width, int* out_portrait) {
    DecodeCtx ctx;
    int rc = open_video(path, multi_thread, &ctx);
    if (rc != 0) return rc;

    AVStream* st = ctx.fmt->streams[ctx.stream_idx];
    double fps = av_q2d(st->avg_frame_rate);
    if (!(fps > 0)) fps = av_q2d(st->r_frame_rate);
    if (!(fps > 0)) fps = 30.0;
    int64_t frames_length = st->nb_frames;
    int64_t duration = st->duration;

    std::vector<Frame> window;
    double start_idx = 0.0, end_idx = 0.0;
    double clip_size = sampling_rate * num_frames / target_fps * fps;
    bool selective = (duration > 0 && frames_length > 0);

    if (selective) {
        double delta = std::max<double>(frames_length - clip_size, 0);
        if (clip_idx == -1) {
            start_idx = delta * random01;
        } else {
            start_idx = delta * clip_idx / std::max(num_clips, 1);
        }
        end_idx = start_idx + clip_size - 1;
        double timebase = double(duration) / double(frames_length);
        int64_t start_pts = int64_t(start_idx * timebase);
        int64_t end_pts = int64_t(end_idx * timebase);
        rc = decode_window(&ctx, start_pts, end_pts, 1024, &window);
    } else {
        rc = decode_window(&ctx, 0, INT64_MAX / 2, 0, &window);
    }
    if (rc != 0 || window.empty()) {
        for (auto& f : window) av_frame_free(&f.frame);
        return -10;
    }

    // second-stage temporal sampling (decoder.py:357-470): when the decode
    // was selective the window IS the clip → sample over the whole window;
    // otherwise sample the clip range out of the full video.
    int n = int(window.size());
    double sel_start, sel_end;
    if (selective) {
        sel_start = 0;
        sel_end = n - 1;
    } else {
        double delta = std::max<double>(n - clip_size, 0);
        if (clip_idx == -1) sel_start = delta * random01;
        else sel_start = delta * clip_idx / std::max(num_clips, 1);
        sel_end = sel_start + clip_size - 1;
    }

    // output geometry: short side == short_side, preserve aspect, center-crop
    // long side to canvas limits
    int in_w = ctx.dec->width, in_h = ctx.dec->height;
    int new_w, new_h;
    if (in_h <= in_w) {
        new_h = short_side;
        new_w = std::max(short_side,
                         int(std::lround(double(in_w) * short_side / in_h)));
    } else {
        new_w = short_side;
        new_h = int(std::lround(double(in_h) * short_side / in_w));
    }
    int portrait = (keep_tall && in_h > in_w && new_h > short_side) ? 1 : 0;
    if (out_portrait) *out_portrait = portrait;
    int crop_w, crop_h, x_off, y_off;
    if (portrait) {
        // transposed write: canvas rows = source columns (== short_side),
        // canvas cols = source rows (vertical extent, center-cropped to
        // the canvas width) — see the keep_tall doc above
        crop_h = new_w;                         // == short_side
        crop_w = std::min(new_h, max_width);    // source vertical extent
        x_off = 0;
        y_off = (new_h - crop_w) / 2;           // center crop along source y
    } else {
        crop_w = std::min(new_w, max_width);
        crop_h = std::min(new_h, short_side);
        x_off = (new_w - crop_w) / 2;
        y_off = (new_h - crop_h) / 2;
    }
    *out_width = crop_w;

    // Contract with the Python side (data/decoder.py uses np.empty): on
    // success EVERY byte of the buffer is written — crop_h content rows
    // spanning all short_side rows, plus per-row zeroed column tails. If a
    // future geometry change breaks that (crop_h < short_side), fail loudly
    // here instead of leaking uninitialized heap into model inputs.
    if (crop_h != short_side || crop_w > max_width) {
        for (auto& f : window) av_frame_free(&f.frame);
        return -13;
    }

    SwsContext* sws = sws_getContext(
        in_w, in_h, ctx.dec->pix_fmt, new_w, new_h, AV_PIX_FMT_RGB24,
        SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!sws) {
        for (auto& f : window) av_frame_free(&f.frame);
        return -11;
    }

    std::vector<uint8_t> rgb(size_t(new_w) * new_h * 3);
    uint8_t* dst_data[4] = {rgb.data(), nullptr, nullptr, nullptr};
    int dst_linesize[4] = {new_w * 3, 0, 0, 0};

    size_t row_bytes = size_t(max_width) * 3;
    size_t frame_bytes = size_t(short_side) * row_bytes;
    // Right-pad (columns >= crop_w) is zeroed per row below instead of a
    // whole-buffer memset: content rows always span all short_side rows
    // (crop_h == short_side on both branches), so only the column tail
    // needs zeroing — a whole-buffer pass costs ~6% of decode time at
    // canvas sizes (3.15 ms / 12.6 MB buffer, PERF.md r4) and doubles for
    // the test loader's wide (4:1) buffers.
    size_t pad_bytes = size_t(max_width - crop_w) * 3;

    for (int i = 0; i < num_frames; ++i) {
        double pos = (num_frames == 1)
                         ? sel_start
                         : sel_start + (sel_end - sel_start) * i / (num_frames - 1);
        int idx = int(std::lround(pos));
        idx = std::min(std::max(idx, 0), n - 1);
        AVFrame* f = window[size_t(idx)].frame;
        sws_scale(sws, f->data, f->linesize, 0, in_h, dst_data, dst_linesize);
        uint8_t* dst = out + size_t(i) * frame_bytes;
        if (portrait) {
            // out[row=src_x][col=src_y - y_off]: pure axis swap
            for (int x = 0; x < crop_h; ++x) {
                uint8_t* orow = dst + size_t(x) * row_bytes;
                for (int y = 0; y < crop_w; ++y) {
                    const uint8_t* p =
                        rgb.data() + (size_t(y + y_off) * new_w + x) * 3;
                    orow[size_t(y) * 3 + 0] = p[0];
                    orow[size_t(y) * 3 + 1] = p[1];
                    orow[size_t(y) * 3 + 2] = p[2];
                }
                if (pad_bytes)
                    std::memset(orow + size_t(crop_w) * 3, 0, pad_bytes);
            }
        } else {
            for (int y = 0; y < crop_h; ++y) {
                uint8_t* orow = dst + size_t(y) * row_bytes;
                const uint8_t* src =
                    rgb.data() + (size_t(y + y_off) * new_w + x_off) * 3;
                std::memcpy(orow, src, size_t(crop_w) * 3);
                if (pad_bytes)
                    std::memset(orow + size_t(crop_w) * 3, 0, pad_bytes);
            }
        }
    }

    sws_freeContext(sws);
    for (auto& f : window) av_frame_free(&f.frame);
    return 0;
}

// Original ABI: tall content center-cropped square (pre-r4 behavior).
int esf_decode_clip(const char* path, int num_frames, double sampling_rate,
                    double target_fps, int clip_idx, int num_clips,
                    double random01, int short_side, int max_width,
                    int multi_thread, unsigned char* out, int* out_width) {
    int portrait = 0;
    return esf_decode_clip2(path, num_frames, sampling_rate, target_fps,
                            clip_idx, num_clips, random01, short_side,
                            max_width, multi_thread, /*keep_tall=*/0, out,
                            out_width, &portrait);
}

// Probe basic stream info. Returns 0 on success.
int esf_probe(const char* path, double* fps, int64_t* nb_frames,
              int* width, int* height) {
    DecodeCtx ctx;
    int rc = open_video(path, 0, &ctx);
    if (rc != 0) return rc;
    AVStream* st = ctx.fmt->streams[ctx.stream_idx];
    *fps = av_q2d(st->avg_frame_rate);
    *nb_frames = st->nb_frames;
    *width = ctx.dec->width;
    *height = ctx.dec->height;
    return 0;
}

// ---------------------------------------------------------------------------
// Streaming mpeg4 encoder: open once, append RGB24 frames per window, close
// writes the trailer. This is the demo's annotated-output sink (constant
// memory over arbitrarily long camera streams — the reference streams through
// cv2.VideoWriter, tools/demo_net.py:62-75); esf_write_test_video composes it
// for one-shot fixture encodes.

struct EncodeCtx {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* enc = nullptr;
    AVStream* st = nullptr;
    SwsContext* sws = nullptr;
    AVFrame* frm = nullptr;
    AVPacket* pkt = nullptr;
    int w = 0, h = 0;
    int64_t next_pts = 0;
};

static void encoder_free(EncodeCtx* ctx) {
    if (!ctx) return;
    if (ctx->pkt) av_packet_free(&ctx->pkt);
    if (ctx->frm) av_frame_free(&ctx->frm);
    if (ctx->sws) sws_freeContext(ctx->sws);
    if (ctx->enc) avcodec_free_context(&ctx->enc);
    if (ctx->fmt) {
        if (!(ctx->fmt->oformat->flags & AVFMT_NOFILE) && ctx->fmt->pb)
            avio_closep(&ctx->fmt->pb);
        avformat_free_context(ctx->fmt);
    }
    delete ctx;
}

static int encoder_drain(EncodeCtx* ctx, AVFrame* f) {
    int rc = avcodec_send_frame(ctx->enc, f);
    if (rc < 0 && rc != AVERROR_EOF) return rc;
    while (avcodec_receive_packet(ctx->enc, ctx->pkt) == 0) {
        av_packet_rescale_ts(ctx->pkt, ctx->enc->time_base,
                             ctx->st->time_base);
        // give every packet its display duration (one tick), otherwise the
        // container duration excludes the last frame and avg_frame_rate
        // reads n/(n-1) too high for short clips
        if (ctx->pkt->duration == 0)
            ctx->pkt->duration = av_rescale_q(1, ctx->enc->time_base,
                                              ctx->st->time_base);
        ctx->pkt->stream_index = ctx->st->index;
        rc = av_interleaved_write_frame(ctx->fmt, ctx->pkt);
        av_packet_unref(ctx->pkt);
        if (rc < 0) return rc;  // mux/IO failure (e.g. ENOSPC) propagates
    }
    return 0;
}

void* esf_encoder_open(const char* path, int w, int h, int fps) {
    EncodeCtx* ctx = new EncodeCtx();
    ctx->w = w;
    ctx->h = h;
    avformat_alloc_output_context2(&ctx->fmt, nullptr, nullptr, path);
    if (!ctx->fmt) { encoder_free(ctx); return nullptr; }
    const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!codec) { encoder_free(ctx); return nullptr; }
    ctx->st = avformat_new_stream(ctx->fmt, nullptr);
    ctx->enc = avcodec_alloc_context3(codec);
    if (!ctx->st || !ctx->enc) { encoder_free(ctx); return nullptr; }
    ctx->enc->width = w;
    ctx->enc->height = h;
    ctx->enc->time_base = {1, fps};
    ctx->enc->framerate = {fps, 1};
    ctx->enc->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->enc->gop_size = 8;
    ctx->enc->bit_rate = 4000000;
    if (ctx->fmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(ctx->enc, codec, nullptr) < 0) {
        encoder_free(ctx); return nullptr;
    }
    avcodec_parameters_from_context(ctx->st->codecpar, ctx->enc);
    ctx->st->time_base = ctx->enc->time_base;
    if (!(ctx->fmt->oformat->flags & AVFMT_NOFILE))
        if (avio_open(&ctx->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
            encoder_free(ctx); return nullptr;
        }
    if (avformat_write_header(ctx->fmt, nullptr) < 0) {
        encoder_free(ctx); return nullptr;
    }
    ctx->sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                              AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                              nullptr, nullptr, nullptr);
    ctx->frm = av_frame_alloc();
    ctx->frm->format = AV_PIX_FMT_YUV420P;
    ctx->frm->width = w;
    ctx->frm->height = h;
    av_frame_get_buffer(ctx->frm, 0);
    ctx->pkt = av_packet_alloc();
    if (!ctx->sws || !ctx->frm || !ctx->pkt) {
        encoder_free(ctx); return nullptr;
    }
    return ctx;
}

int esf_encoder_append(void* handle, const unsigned char* rgb, int n) {
    EncodeCtx* ctx = static_cast<EncodeCtx*>(handle);
    if (!ctx) return -1;
    for (int i = 0; i < n; ++i) {
        const uint8_t* src_data[4] = {
            rgb + size_t(i) * ctx->w * ctx->h * 3, nullptr, nullptr, nullptr};
        int src_linesize[4] = {ctx->w * 3, 0, 0, 0};
        av_frame_make_writable(ctx->frm);
        sws_scale(ctx->sws, src_data, src_linesize, 0, ctx->h,
                  ctx->frm->data, ctx->frm->linesize);
        ctx->frm->pts = ctx->next_pts++;
        int rc = encoder_drain(ctx, ctx->frm);
        if (rc < 0) return rc;  // encode/mux failure is NOT silent
    }
    return 0;
}

int esf_encoder_close(void* handle) {
    EncodeCtx* ctx = static_cast<EncodeCtx*>(handle);
    if (!ctx) return -1;
    int rc = encoder_drain(ctx, nullptr);
    int rc2 = av_write_trailer(ctx->fmt);
    encoder_free(ctx);
    return rc < 0 ? rc : rc2;
}

// Encode `n` RGB24 frames (h x w) into an mpeg4 .mp4 — test-fixture helper
// and one-shot form of the streaming encoder above.
int esf_write_test_video(const char* path, const unsigned char* rgb, int n,
                         int w, int h, int fps) {
    void* ctx = esf_encoder_open(path, w, h, fps);
    if (!ctx) return -1;
    int rc = esf_encoder_append(ctx, rgb, n);
    int rc2 = esf_encoder_close(ctx);
    return rc != 0 ? rc : rc2;
}

}  // extern "C"
