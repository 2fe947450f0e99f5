/* Conformance-oracle helper for arithmetic-JPEG tests.
 * encode mode: stdin = "W H QUAL ARITH SAMP RST\n" + W*H*3 raw RGB bytes
 *              stdout = JPEG stream
 * decode mode: stdin = JPEG stream; stdout = "W H\n" + raw RGB bytes
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t r;
  while ((r = fread(buf + len, 1, cap - len, f)) > 0) {
    len += r;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  if (strcmp(argv[1], "encode") == 0) {
    int w, h, qual, arith, samp, rst, prog = 0;
    if (scanf("%d %d %d %d %d %d %d", &w, &h, &qual, &arith, &samp, &rst, &prog) != 7 || fgetc(stdin) != 0x0A)
      return 3;
    size_t need = (size_t)w * h * 3;
    unsigned char *rgb = malloc(need);
    if (fread(rgb, 1, need, stdin) != need) return 4;
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    unsigned char *out = NULL; unsigned long outlen = 0;
    jpeg_mem_dest(&c, &out, &outlen);
    c.image_width = w; c.image_height = h;
    c.input_components = 3; c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, qual, TRUE);
    c.arith_code = arith ? TRUE : FALSE;
    c.restart_interval = rst;
    if (prog)
      jpeg_simple_progression(&c);
    if (samp == 1) { /* 4:4:4 */
      c.comp_info[0].h_samp_factor = 1; c.comp_info[0].v_samp_factor = 1;
    } /* samp == 2 keeps the default 4:2:0 */
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
      JSAMPROW row = rgb + (size_t)c.next_scanline * w * 3;
      jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    fwrite(out, 1, outlen, stdout);
    return 0;
  }
  if (strcmp(argv[1], "decode") == 0) {
    size_t n; unsigned char *buf = read_all(stdin, &n);
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, buf, n);
    jpeg_read_header(&d, TRUE);
    d.out_color_space = JCS_RGB;
    /* match a spec-flowchart decoder: no fancy upsampling smoothing */
    d.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&d);
    printf("%d %d\n", d.output_width, d.output_height);
    unsigned char *row = malloc((size_t)d.output_width * 3);
    while (d.output_scanline < d.output_height) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&d, &r, 1);
      fwrite(row, 1, (size_t)d.output_width * 3, stdout);
    }
    jpeg_finish_decompress(&d);
    return 0;
  }
  return 2;
}
