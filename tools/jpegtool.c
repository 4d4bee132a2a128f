/* jpegtool — tiny libjpeg(-turbo) CLI used ONLY as a conformance oracle for
 * the repo's pure-Python JPEG codec (ext/jpeg.py, ext/jarith.py).
 *
 *   jpegtool decode <in.jpg> <out.ppm>
 *   jpegtool encode <in.ppm> <out.jpg> <quality> <arith 0|1> <subsamp 444|420>
 *
 * Built on demand by tests (gcc -O2 -o jpegtool tools/jpegtool.c -ljpeg);
 * tests skip when gcc or jpeglib.h is unavailable.  The system libjpeg is the
 * independent implementation our arithmetic-coded streams must interoperate
 * with: encode here / decode there and vice versa.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "jpegtool: %s\n", msg); exit(2); }

static int decode(const char *in, const char *out) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb"), *fo;
  if (!fi) die("cannot open input");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fi);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  fo = fopen(out, "wb");
  if (!fo) die("cannot open output");
  fprintf(fo, "P6\n%u %u\n255\n", cinfo.output_width, cinfo.output_height);
  {
    JSAMPROW row = malloc((size_t)cinfo.output_width * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, &row, 1);
      fwrite(row, 3, cinfo.output_width, fo);
    }
    free(row);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fi); fclose(fo);
  return 0;
}

static int encode(const char *in, const char *out, int quality, int arith,
                  const char *subsamp, int progressive) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned w, h, maxv;
  FILE *fi = fopen(in, "rb"), *fo;
  if (!fi) die("cannot open input");
  if (fscanf(fi, "P6 %u %u %u", &w, &h, &maxv) != 3 || maxv != 255)
    die("expect P6 maxval 255");
  fgetc(fi); /* single whitespace after header */
  {
    unsigned char *px = malloc((size_t)w * h * 3);
    if (fread(px, 3, (size_t)w * h, fi) != (size_t)w * h) die("short ppm");
    fclose(fi);
    fo = fopen(out, "wb");
    if (!fo) die("cannot open output");
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, fo);
    cinfo.image_width = w; cinfo.image_height = h;
    cinfo.input_components = 3; cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    if (progressive) jpeg_simple_progression(&cinfo);
    if (strcmp(subsamp, "444") == 0) {
      cinfo.comp_info[0].h_samp_factor = 1; cinfo.comp_info[0].v_samp_factor = 1;
    } /* 420 is the libjpeg default (2x2, 1x1, 1x1) */
    /* no JFIF/Adobe wrappers beyond defaults; optimize off for determinism */
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = px + (size_t)cinfo.next_scanline * w * 3;
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    free(px); fclose(fo);
  }
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && strcmp(argv[1], "decode") == 0)
    return decode(argv[2], argv[3]);
  if (argc >= 7 && strcmp(argv[1], "encode") == 0)
    return encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]), argv[6],
                  argc >= 8 ? atoi(argv[7]) : 0);
  die("usage: jpegtool decode in.jpg out.ppm | encode in.ppm out.jpg q arith 444|420 [prog]");
  return 2;
}
