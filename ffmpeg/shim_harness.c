/*
 * Functional mini-libavfilter harness: EXECUTES the real vf_raisr_tpu.c
 * filter code without an FFmpeg tree.
 *
 * The compile shim (compile_shim/avfilter.h) declares the libavfilter
 * surface the filter touches; this file supplies working implementations
 * of the two entry points the filter calls back into (ff_get_video_buffer,
 * ff_filter_frame) and drives the filter's own lifecycle exactly as
 * libavfilter would: option parsing through genuine libavutil av_opt
 * (defaults + ratio=2:passes=2:... strings), init, config_props on both
 * links, filter_frame per frame. Frames are real AVFrames from
 * av_frame_get_buffer, so linesize > width whenever the width is not a
 * multiple of the allocator's alignment — the filter's RTPUPlane step
 * handling runs against genuinely padded buffers.
 *
 * This covers everything between libavfilter's framework and the C ABI —
 * the exact code the reference exercises via its built vf_raisr filter
 * (reference ffmpeg/vf_raisr.c:226-333). The only parts NOT executed here
 * are FFmpeg's own format negotiation and graph plumbing, which the CI
 * full-tree build covers (build_ffmpeg_ci.sh).
 *
 * Usage:
 *   shim_filter in.y4m out.y4m "ratio=2:passes=2:filterfolder=/path"
 *
 * Supports C420 (8-bit) and C420p10 Y4M streams; output header matches the
 * raisr CLI writer so outputs are byte-comparable.
 *
 * Build: ffmpeg/shim_filter_build.sh
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "libavutil/frame.h"
#include "libavutil/mem.h"
#include "libavutil/opt.h"
#include "libavutil/pixdesc.h"
#include "avfilter.h"
#include "video.h"

extern const AVFilter ff_vf_raisr_tpu;

/* ---- the two libavfilter entry points the filter calls back into ---- */

static AVFrame *captured;

AVFrame *ff_get_video_buffer(AVFilterLink *link, int w, int h)
{
    AVFrame *f = av_frame_alloc();
    if (!f)
        return NULL;
    f->format = link->format;
    f->width = w;
    f->height = h;
    if (av_frame_get_buffer(f, 0) < 0) { /* real aligned linesizes */
        av_frame_free(&f);
        return NULL;
    }
    return f;
}

int ff_filter_frame(AVFilterLink *link, AVFrame *frame)
{
    (void)link;
    captured = frame;
    return 0;
}

/* ---------------------------- Y4M plumbing --------------------------- */

static int read_line(FILE *f, char *buf, int n)
{
    int i = 0, c;
    while (i < n - 1 && (c = fgetc(f)) != EOF && c != '\n')
        buf[i++] = (char)c;
    buf[i] = 0;
    return i;
}

static int read_plane(FILE *f, AVFrame *frame, int p, int w, int h, int bpp)
{
    for (int r = 0; r < h; r++)
        if (fread(frame->data[p] + (ptrdiff_t)r * frame->linesize[p], 1,
                  (size_t)w * bpp, f) != (size_t)w * bpp)
            return -1;
    return 0;
}

static void write_plane(FILE *f, const AVFrame *frame, int p, int w, int h,
                        int bpp)
{
    for (int r = 0; r < h; r++)
        fwrite(frame->data[p] + (ptrdiff_t)r * frame->linesize[p], 1,
               (size_t)w * bpp, f);
}

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "usage: %s in.y4m out.y4m \"opt=val:opt=val\"\n",
                argv[0]);
        return 2;
    }
    FILE *fin = fopen(argv[1], "rb");
    if (!fin) {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }
    char header[512];
    read_line(fin, header, sizeof(header));
    if (strncmp(header, "YUV4MPEG2", 9)) {
        fprintf(stderr, "not a y4m file\n");
        return 1;
    }
    int w = 0, h = 0, bits = 8;
    char rate[64] = "F25:1", interlace[16] = "Ip", aspect[32] = "A1:1";
    for (char *tok = strtok(header + 9, " "); tok; tok = strtok(NULL, " ")) {
        if (tok[0] == 'W') w = atoi(tok + 1);
        if (tok[0] == 'H') h = atoi(tok + 1);
        if (tok[0] == 'F') snprintf(rate, sizeof(rate), "%s", tok);
        if (tok[0] == 'I') snprintf(interlace, sizeof(interlace), "%s", tok);
        if (tok[0] == 'A') snprintf(aspect, sizeof(aspect), "%s", tok);
        if (tok[0] == 'C') {
            if (!strncmp(tok, "C420p10", 7)) {
                bits = 10;
            } else if (strncmp(tok, "C420", 4)) {
                fprintf(stderr, "only C420/C420p10 supported, got %s\n", tok);
                return 1;
            }
        }
    }
    if (w <= 0 || h <= 0) {
        fprintf(stderr, "bad y4m geometry\n");
        return 1;
    }
    int bpp = bits > 8 ? 2 : 1;
    enum AVPixelFormat fmt =
        bits > 8 ? AV_PIX_FMT_YUV420P10LE : AV_PIX_FMT_YUV420P;

    /* ---- stand up the filter exactly as libavfilter would ---- */
    AVFilterContext ctx = {0};
    AVFilterLink inlink = {0}, outlink = {0};
    AVFilterLink *ins[1] = {&inlink}, *outs[1] = {&outlink};

    ctx.av_class = ff_vf_raisr_tpu.priv_class;
    ctx.priv = av_mallocz(ff_vf_raisr_tpu.priv_size);
    if (!ctx.priv)
        return 1;
    *(const AVClass **)ctx.priv = ff_vf_raisr_tpu.priv_class;
    av_opt_set_defaults(ctx.priv);
    if (argv[3][0] && av_set_options_string(ctx.priv, argv[3], "=", ":") < 0) {
        fprintf(stderr, "bad option string: %s\n", argv[3]);
        return 1;
    }
    ctx.inputs = ins;
    ctx.outputs = outs;
    inlink.dst = &ctx;
    inlink.format = fmt;
    inlink.w = w;
    inlink.h = h;
    outlink.src = &ctx;
    outlink.format = fmt;

    if (ff_vf_raisr_tpu.init(&ctx)) {
        fprintf(stderr, "filter init failed\n");
        return 1;
    }
    if (ff_vf_raisr_tpu.inputs[0].config_props &&
        ff_vf_raisr_tpu.inputs[0].config_props(&inlink)) {
        fprintf(stderr, "input config_props failed\n");
        return 1;
    }
    if (ff_vf_raisr_tpu.outputs[0].config_props &&
        ff_vf_raisr_tpu.outputs[0].config_props(&outlink)) {
        fprintf(stderr, "output config_props failed\n");
        return 1;
    }

    FILE *fout = fopen(argv[2], "wb");
    if (!fout) {
        fprintf(stderr, "cannot open %s\n", argv[2]);
        return 1;
    }
    /* tags match raisr_tpu.video's writer so outputs are byte-comparable */
    fprintf(fout, "YUV4MPEG2 W%d H%d %s %s %s %s\n", outlink.w, outlink.h,
            rate, interlace, aspect, bits > 8 ? "C420p10" : "C420jpeg");

    char fh[256];
    int nframes = 0;
    while (read_line(fin, fh, sizeof(fh)) > 0) {
        if (strncmp(fh, "FRAME", 5))
            break;
        AVFrame *in = ff_get_video_buffer(&inlink, w, h);
        if (!in)
            return 1;
        if (read_plane(fin, in, 0, w, h, bpp) ||
            read_plane(fin, in, 1, w / 2, h / 2, bpp) ||
            read_plane(fin, in, 2, w / 2, h / 2, bpp)) {
            fprintf(stderr, "short frame %d\n", nframes);
            av_frame_free(&in);
            break;
        }
        captured = NULL;
        int rc = ff_vf_raisr_tpu.inputs[0].filter_frame(&inlink, in);
        if (rc || !captured) {
            fprintf(stderr, "filter_frame failed at frame %d: %d\n", nframes,
                    rc);
            return 1;
        }
        fputs("FRAME\n", fout);
        write_plane(fout, captured, 0, outlink.w, outlink.h, bpp);
        write_plane(fout, captured, 1, outlink.w / 2, outlink.h / 2, bpp);
        write_plane(fout, captured, 2, outlink.w / 2, outlink.h / 2, bpp);
        av_frame_free(&captured);
        nframes++;
    }
    fclose(fin);
    fclose(fout);
    ff_vf_raisr_tpu.uninit(&ctx);
    av_opt_free(ctx.priv);
    av_free(ctx.priv);
    fprintf(stderr, "shim_filter: %d frame(s) %dx%d -> %dx%d (%d-bit)\n",
            nframes, w, h, outlink.w, outlink.h, bits);
    return nframes > 0 ? 0 : 1;
}
