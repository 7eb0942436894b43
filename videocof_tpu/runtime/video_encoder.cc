// Native video encode runtime.
//
// Completes the first-party host video path (decode: video_decoder.cc): mux
// + encode the pipeline's uint8 output into an mp4 with libavformat/
// libavcodec, replacing the reference's imageio-ffmpeg/cv2 writer
// dependency (`videox_fun/utils/utils.py:59-143`, our utils/video_io.py cv2
// fallback).
//
// Two entry points:
//   vcf_encode_video_rgb  — packed [T, H, W, 3] uint8 RGB (the default
//                           pipeline output); converted via libswscale.
//   vcf_encode_video_i420 — packed [T, H*3/2, W] uint8 I420 planes, the
//                           EXACT layout the on-device YUV420 fetch
//                           produces (utils/colorspace.py): frames go
//                           straight into the encoder with zero host-side
//                           colorspace work.
//
// Encoder selection: libx264 when the ffmpeg build carries it, else the
// built-in MPEG-4 Part 2 encoder (the same codec cv2's "mp4v" uses).
//
// C ABI only (ctypes-friendly). Thread-safe: each call owns its contexts.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

thread_local std::string g_enc_error;
void enc_error(const std::string& msg) { g_enc_error = msg; }

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVStream* stream = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  bool header_written = false;

  ~Encoder() {
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) {
      if (fmt->pb) avio_closep(&fmt->pb);
      avformat_free_context(fmt);
    }
  }

  bool open(const char* path, int height, int width, double fps,
            int64_t bitrate) {
    if (fps <= 0) fps = 16.0;
    if (avformat_alloc_output_context2(&fmt, nullptr, "mp4", path) < 0 ||
        !fmt) {
      enc_error("cannot allocate mp4 muxer");
      return false;
    }
    const AVCodec* enc = avcodec_find_encoder_by_name("libx264");
    if (!enc) enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!enc) {
      enc_error("no H.264/MPEG-4 encoder in this ffmpeg build");
      return false;
    }
    stream = avformat_new_stream(fmt, nullptr);
    codec = avcodec_alloc_context3(enc);
    if (!stream || !codec) {
      enc_error("cannot allocate stream/codec");
      return false;
    }
    codec->width = width;
    codec->height = height;
    codec->pix_fmt = AV_PIX_FMT_YUV420P;
    // fps as an exact rational (16 -> 16/1; 29.97 -> 30000/1001-ish)
    AVRational fr = av_d2q(fps, 100000);
    codec->time_base = av_inv_q(fr);
    codec->framerate = fr;
    if (bitrate <= 0)
      bitrate = (int64_t)width * height * (int64_t)(fps + 0.5) / 2;
    codec->bit_rate = bitrate;
    codec->gop_size = 12;
    if (enc->id == AV_CODEC_ID_H264)
      av_opt_set(codec->priv_data, "preset", "fast", 0);
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(codec, enc, nullptr) < 0) {
      enc_error("cannot open encoder");
      return false;
    }
    avcodec_parameters_from_context(stream->codecpar, codec);
    stream->time_base = codec->time_base;
    stream->avg_frame_rate = fr;
    stream->r_frame_rate = fr;
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      enc_error(std::string("cannot open output ") + path);
      return false;
    }
    if (avformat_write_header(fmt, nullptr) < 0) {
      enc_error("cannot write mp4 header");
      return false;
    }
    header_written = true;
    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    frame->format = AV_PIX_FMT_YUV420P;
    frame->width = width;
    frame->height = height;
    if (av_frame_get_buffer(frame, 0) < 0) {
      enc_error("cannot allocate frame buffer");
      return false;
    }
    return true;
  }

  bool drain() {
    while (true) {
      int r = avcodec_receive_packet(codec, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return true;
      if (r < 0) {
        enc_error("encode error");
        return false;
      }
      av_packet_rescale_ts(pkt, codec->time_base, stream->time_base);
      pkt->stream_index = stream->index;
      if (av_interleaved_write_frame(fmt, pkt) < 0) {
        enc_error("mux error");
        return false;
      }
    }
  }

  bool submit(int64_t pts) {
    frame->pts = pts;
    if (avcodec_send_frame(codec, frame) < 0) {
      enc_error("cannot send frame");
      return false;
    }
    return drain();
  }

  bool finish() {
    if (avcodec_send_frame(codec, nullptr) < 0) return false;
    if (!drain()) return false;
    if (av_write_trailer(fmt) < 0) {
      enc_error("cannot write mp4 trailer");
      return false;
    }
    return true;
  }
};

// copy one packed I420 frame ([h*3/2, w], chroma rows packed row-major at
// width w — the utils/colorspace.py layout) into the encoder's AVFrame
void fill_i420(AVFrame* f, const uint8_t* src, int h, int w) {
  for (int r = 0; r < h; ++r)
    memcpy(f->data[0] + (size_t)r * f->linesize[0], src + (size_t)r * w, w);
  const uint8_t* u = src + (size_t)h * w;
  const uint8_t* v = u + (size_t)(h / 2) * (w / 2);
  for (int r = 0; r < h / 2; ++r) {
    memcpy(f->data[1] + (size_t)r * f->linesize[1], u + (size_t)r * (w / 2),
           w / 2);
    memcpy(f->data[2] + (size_t)r * f->linesize[2], v + (size_t)r * (w / 2),
           w / 2);
  }
}

}  // namespace

extern "C" {

const char* vcf_enc_last_error() { return g_enc_error.c_str(); }

// Encode n packed [H*3/2, W] uint8 I420 frames to an mp4. Returns 0 on
// success, -1 on error (vcf_enc_last_error()).
int vcf_encode_video_i420(const char* path, const uint8_t* i420, int n_frames,
                          int height, int width, double fps,
                          int64_t bitrate) {
  if (n_frames <= 0 || height % 2 || width % 2) {
    enc_error("need n_frames > 0 and even dimensions");
    return -1;
  }
  Encoder e;
  if (!e.open(path, height, width, fps, bitrate)) return -1;
  const size_t fsz = (size_t)height * 3 / 2 * width;
  for (int i = 0; i < n_frames; ++i) {
    if (av_frame_make_writable(e.frame) < 0) return -1;
    fill_i420(e.frame, i420 + (size_t)i * fsz, height, width);
    if (!e.submit(i)) return -1;
  }
  return e.finish() ? 0 : -1;
}

// Encode n packed [H, W, 3] uint8 RGB frames to an mp4 (swscale RGB24 ->
// YUV420P). Returns 0 on success, -1 on error.
int vcf_encode_video_rgb(const char* path, const uint8_t* rgb, int n_frames,
                         int height, int width, double fps, int64_t bitrate) {
  if (n_frames <= 0 || height % 2 || width % 2) {
    enc_error("need n_frames > 0 and even dimensions");
    return -1;
  }
  Encoder e;
  if (!e.open(path, height, width, fps, bitrate)) return -1;
  SwsContext* sws =
      sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                     AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                     nullptr);
  if (!sws) {
    enc_error("cannot create swscale context");
    return -1;
  }
  const size_t fsz = (size_t)height * width * 3;
  int src_stride[1] = {width * 3};
  for (int i = 0; i < n_frames; ++i) {
    if (av_frame_make_writable(e.frame) < 0) {
      sws_freeContext(sws);
      return -1;
    }
    const uint8_t* src[1] = {rgb + (size_t)i * fsz};
    sws_scale(sws, src, src_stride, 0, height, e.frame->data,
              e.frame->linesize);
    if (!e.submit(i)) {
      sws_freeContext(sws);
      return -1;
    }
  }
  sws_freeContext(sws);
  return e.finish() ? 0 : -1;
}

}  // extern "C"
