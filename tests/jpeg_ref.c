/* Minimal libjpeg shim, used ONLY as a test oracle.
 *
 * The engine's JPEG decode (operators/codecs.py + operators/jpeg_arith.py)
 * is native Python/numpy; this shim lets the test suite validate the
 * arithmetic-coded paths against the canonical libjpeg(-turbo) build when
 * its headers are present (tests skip otherwise).  Three entry points:
 *
 *   jref_decode     — decode any supported JPEG to RGB/gray pixels
 *   jref_transcode  — LOSSLESS coefficient transcode (Huffman <-> arith,
 *                     optionally to a progressive scan script): the same
 *                     quantized coefficients re-entropy-coded, so a native
 *                     decode of input and output must be byte-identical
 *   jref_encode     — compress RGB/gray pixels (arith/progressive knobs)
 *
 * Compiled on demand by tests/libjpeg_ref.py with:
 *   gcc -O2 -shared -fPIC jpeg_ref.c -o jpeg_ref.so -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct jref_err {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void jref_error_exit(j_common_ptr cinfo)
{
    struct jref_err *e = (struct jref_err *)cinfo->err;
    longjmp(e->jb, 1);
}

void jref_free(unsigned char *p)
{
    free(p);
}

/* Decode to packed 8-bit pixels (RGB or grayscale).  Returns 0 on
 * success; *out is malloc'd (caller frees via jref_free). */
int jref_decode(const unsigned char *in, unsigned long n,
                unsigned char **out, int *w, int *h, int *ch)
{
    struct jpeg_decompress_struct cinfo;
    struct jref_err jerr;
    unsigned char *buf = NULL;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jref_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        free(buf);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, in, n);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    {
        int stride = cinfo.output_width * cinfo.output_components;
        buf = malloc((size_t)stride * cinfo.output_height);
        if (!buf)
            longjmp(jerr.jb, 1);
        while (cinfo.output_scanline < cinfo.output_height) {
            unsigned char *row = buf +
                (size_t)cinfo.output_scanline * stride;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        *w = cinfo.output_width;
        *h = cinfo.output_height;
        *ch = cinfo.output_components;
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buf;
    return 0;
}

/* Lossless entropy transcode via jpeg_read/write_coefficients. */
int jref_transcode(const unsigned char *in, unsigned long n,
                   int arith, int progressive,
                   unsigned char **out, unsigned long *outn)
{
    struct jpeg_decompress_struct src;
    struct jpeg_compress_struct dst;
    struct jref_err jerr;
    jvirt_barray_ptr *coefs;
    unsigned char *obuf = NULL;
    unsigned long osize = 0;

    src.err = jpeg_std_error(&jerr.pub);
    dst.err = src.err;
    jerr.pub.error_exit = jref_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&src);
        jpeg_destroy_compress(&dst);
        free(obuf);
        return 1;
    }
    jpeg_create_decompress(&src);
    jpeg_create_compress(&dst);
    jpeg_mem_src(&src, in, n);
    jpeg_read_header(&src, TRUE);
    coefs = jpeg_read_coefficients(&src);
    jpeg_copy_critical_parameters(&src, &dst);
    dst.arith_code = arith ? TRUE : FALSE;
    if (!arith) {
        dst.optimize_coding = TRUE;   /* regenerate Huffman tables */
    }
    if (progressive)
        jpeg_simple_progression(&dst);
    jpeg_mem_dest(&dst, &obuf, &osize);
    jpeg_write_coefficients(&dst, coefs);
    jpeg_finish_compress(&dst);
    jpeg_finish_decompress(&src);
    jpeg_destroy_compress(&dst);
    jpeg_destroy_decompress(&src);
    *out = obuf;
    *outn = osize;
    return 0;
}

/* Compress packed RGB (ch=3) or grayscale (ch=1) pixels. */
int jref_encode(const unsigned char *pix, int w, int h, int ch,
                int quality, int arith, int progressive, int restart,
                unsigned char **out, unsigned long *outn)
{
    struct jpeg_compress_struct cinfo;
    struct jref_err jerr;
    unsigned char *obuf = NULL;
    unsigned long osize = 0;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jref_error_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        free(obuf);
        return 1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &obuf, &osize);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = (ch == 1) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    if (progressive)
        jpeg_simple_progression(&cinfo);
    cinfo.restart_interval = restart;
    jpeg_start_compress(&cinfo, TRUE);
    {
        int stride = w * ch;
        while (cinfo.next_scanline < cinfo.image_height) {
            const unsigned char *row = pix +
                (size_t)cinfo.next_scanline * stride;
            jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
        }
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *out = obuf;
    *outn = osize;
    return 0;
}
