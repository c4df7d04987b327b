"""Useful-FLOPs MFU for the flagship pretrain step @ batch 16 (2xMAC conv.).
Paths (train/step.py): dual towers (12v+12t) + shared v_un (6v) +
MLM fused (6v+12t) + ITM fused (6v+12t); patchify shared; no remat."""
B, F, N, D = 16, 4, 196, 768
S, L = 1 + F * N, 15
vt, tt = B * S, B * L
d2 = lambda m, k, n: 2 * m * k * n
vb = (d2(vt, D, 3*D) + d2(vt, D, D)) * 2 \
   + 2 * 2 * B * 12 * S * (F + 1) * 64 \
   + 2 * 2 * B * 12 * S * (N + 1) * 64 \
   + d2(vt, D, 4*D) + d2(vt, 4*D, D)
tb = d2(tt, D, 3*D) + d2(tt, D, D) + 2*2*B*12*L*L*64 \
   + d2(tt, D, 4*D) + d2(tt, 4*D, D)
cross_v = d2(vt, D, D)*2 + 2*2*B*12*S*L*64          # per fused video block
cross_t = d2(tt, D, D)*2 + 2*2*B*12*L*S*64
patchify = d2(B*F*N, 16*16*3, D)
mlm_head = d2(tt, D, D) + d2(tt, D, 50265)
fwd = 30 * vb + 36 * tb + 6 * (cross_v + cross_t) * 2 + patchify + mlm_head
step = 3 * fwd
PEAK = 197e12
for ms in (376.0, 329.4, 298.8):
    print(f"{ms} ms: useful {step/1e12:.2f} TFLOP/step -> "
          f"{step/(ms/1e3)/1e12:.1f} TFLOP/s = {step/(ms/1e3)/PEAK*100:.1f}% MFU")
