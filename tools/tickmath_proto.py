# Ground-truth prototype of Uniswap V3 tick math (public algorithm,
# reference: uniswap_v3_math/tick_math.rs) in arbitrary-precision Python,
# used to validate the DuckDB limb-arithmetic oracle and generate Scala
# golden vectors.
MIN_TICK, MAX_TICK = -887272, 887272
MIN_SQRT_RATIO = 4295128739
MAX_SQRT_RATIO = 1461446703485210103287273052203988822378723970342

CONSTS = [
 0xfffcb933bd6fad37aa2d162d1a594001,
 0xfff97272373d413259a46990580e213a,
 0xfff2e50f5f656932ef12357cf3c7fdcc,
 0xffe5caca7e10e4e61c3624eaa0941cd0,
 0xffcb9843d60f6159c9db58835c926644,
 0xff973b41fa98c081472e6896dfb254c0,
 0xff2ea16466c96a3843ec78b326b52861,
 0xfe5dee046a99a2a811c461f1969c3053,
 0xfcbe86c7900a88aedcffc83b479aa3a4,
 0xf987a7253ac413176f2b074cf7815e54,
 0xf3392b0822b70005940c7a398e4b70f3,
 0xe7159475a2c29b7443b29c7fa6e889d9,
 0xd097f3bdfd2022b8845ad8f792aa5825,
 0xa9f746462d870fdf8a65dc1f90e061e5,
 0x70d869a156d2a1b890bb3df62baf32f7,
 0x31be135f97d08fd981231505542fcfa6,
 0x9aa508b5b7a84e1c677de54f3e99bc9,
 0x5d6af8dedb81196699c329225ee604,
 0x2216e584f5fa1ea926041bedfe98,
 0x48a170391f7dc42444e8fa2,
]

def get_sqrt_ratio_at_tick(tick):
    assert MIN_TICK <= tick <= MAX_TICK
    a = abs(tick)
    ratio = 0xfffcb933bd6fad37aa2d162d1a594001 if a & 1 else (1 << 128)
    for i in range(1, 20):
        if a & (1 << i):
            ratio = (ratio * CONSTS[i]) >> 128
    if tick > 0:
        ratio = ((1 << 256) - 1) // ratio
    return (ratio >> 32) + (0 if ratio % (1 << 32) == 0 else 1)

SQRT_10001 = 255738958999603826347141
TICK_LOW  = 3402992956809132418596140100660247210
TICK_HIGH = 291339464771989622907027621153398088495

def get_tick_at_sqrt_ratio(x):
    assert MIN_SQRT_RATIO <= x < MAX_SQRT_RATIO
    ratio = x << 32
    msb = ratio.bit_length() - 1
    if msb >= 128: r = ratio >> (msb - 127)
    else: r = ratio << (127 - msb)
    log_2 = (msb - 128) << 64
    for i in range(63, 49, -1):
        r = (r * r) >> 127
        f = r >> 128
        log_2 |= f << i
        r >>= f
    ls = log_2 * SQRT_10001
    tick_low  = (ls - TICK_LOW) >> 128
    tick_high = (ls + TICK_HIGH) >> 128
    if tick_low == tick_high: return tick_low
    return tick_high if get_sqrt_ratio_at_tick(tick_high) <= x else tick_low

if __name__ == "__main__":
    assert get_sqrt_ratio_at_tick(MIN_TICK) == MIN_SQRT_RATIO, get_sqrt_ratio_at_tick(MIN_TICK)
    assert get_sqrt_ratio_at_tick(MAX_TICK) == MAX_SQRT_RATIO, get_sqrt_ratio_at_tick(MAX_TICK)
    assert get_sqrt_ratio_at_tick(0) == 1 << 96
    # round-trip property over a dense sample of the whole range
    import random
    random.seed(7)
    ticks = list(range(-887272, 887273, 997)) + [MIN_TICK, MAX_TICK-1, -1, 0, 1]
    bad = 0
    for t in ticks:
        r = get_sqrt_ratio_at_tick(t)
        if r < MAX_SQRT_RATIO:
            tt = get_tick_at_sqrt_ratio(r)
            if tt != t: bad += 1; print("RT fail", t, tt)
    print("roundtrip ok over", len(ticks), "ticks, bad =", bad)
    for t in [0,1,-1,2,-2,10,-10,100,-100,887271,-887272,400000,-400000]:
        print(t, get_sqrt_ratio_at_tick(t))
