"""CJK → latin transliteration (the ICU Any-Latin stand-in).

The reference falls back to ICU's thread-local Any-Latin
transliterator for names with no latin variant
(``util/ThreadLocalTransliterator.java``).  This container has no
ICU; this module re-expresses the deterministic parts offline:

* **Hangul** (U+AC00–U+D7A3) decomposes arithmetically into
  (initial, medial, final) jamo — romanized with the standard
  letter-for-letter jamo tables (the reversible convention ICU's
  Hangul-Latin uses: 한국 → ``hangug``, 서울 → ``seoul``).
* **Kana** (hiragana U+3041–U+3096, katakana folded down by 0x60)
  through a Hepburn-ish syllable table with small-ya/yu/yo digraphs
  (きゃ → kya, しゃ → sha), sokuon gemination (さっぽろ → sapporo)
  and chōon vowel repetition (トーキョー → tookyoo).  Long vowels are
  spelled out (ou/oo), not macronned.
* **Han** (CJK Unified Ideographs) through a compact pinyin table of
  common codepoints — place-name-heavy, toneless (ICU emits tone
  marks; the toneless form is the documented deviation), one space
  between consecutive han syllables exactly like ICU's Han-Latin
  (北京 → ``bei jing``).  Characters outside the table pass through
  unchanged — the documented non-ICU residue, now a long tail rather
  than all of CJK.

Multi-reading han characters use their most common place-name
reading (长 → chang, 重 → chong).
"""

from __future__ import annotations

# --- Hangul: algorithmic jamo decomposition -------------------------------

_HANGUL_BASE = 0xAC00
_HANGUL_END = 0xD7A3
_INITIALS = ["g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss",
             "", "j", "jj", "ch", "k", "t", "p", "h"]
_MEDIALS = ["a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa",
            "wae", "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui",
            "i"]
_FINALS = ["", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm",
           "lb", "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss",
           "ng", "j", "ch", "k", "t", "p", "h"]


def hangul_syllable(cp: int) -> str:
    s = cp - _HANGUL_BASE
    i, rest = divmod(s, 21 * 28)
    m, f = divmod(rest, 28)
    return _INITIALS[i] + _MEDIALS[m] + _FINALS[f]


# --- Kana ------------------------------------------------------------------

_KANA_ROWS = {
    0x3042: "a", 0x3044: "i", 0x3046: "u", 0x3048: "e", 0x304A: "o",
    0x304B: "ka", 0x304D: "ki", 0x304F: "ku", 0x3051: "ke", 0x3053: "ko",
    0x3055: "sa", 0x3057: "shi", 0x3059: "su", 0x305B: "se", 0x305D: "so",
    0x305F: "ta", 0x3061: "chi", 0x3064: "tsu", 0x3066: "te", 0x3068: "to",
    0x306A: "na", 0x306B: "ni", 0x306C: "nu", 0x306D: "ne", 0x306E: "no",
    0x306F: "ha", 0x3072: "hi", 0x3075: "fu", 0x3078: "he", 0x307B: "ho",
    0x307E: "ma", 0x307F: "mi", 0x3080: "mu", 0x3081: "me", 0x3082: "mo",
    0x3084: "ya", 0x3086: "yu", 0x3088: "yo",
    0x3089: "ra", 0x308A: "ri", 0x308B: "ru", 0x308C: "re", 0x308D: "ro",
    0x308F: "wa", 0x3092: "wo", 0x3093: "n",
    0x304C: "ga", 0x304E: "gi", 0x3050: "gu", 0x3052: "ge", 0x3054: "go",
    0x3056: "za", 0x3058: "ji", 0x305A: "zu", 0x305C: "ze", 0x305E: "zo",
    0x3060: "da", 0x3062: "ji", 0x3065: "zu", 0x3067: "de", 0x3069: "do",
    0x3070: "ba", 0x3073: "bi", 0x3076: "bu", 0x3079: "be", 0x307C: "bo",
    0x3071: "pa", 0x3074: "pi", 0x3077: "pu", 0x307A: "pe", 0x307D: "po",
    0x3094: "vu",
    # small vowels (rare standalone): fold to plain vowels
    0x3041: "a", 0x3043: "i", 0x3045: "u", 0x3047: "e", 0x3049: "o",
}
_SMALL_Y = {0x3083: "ya", 0x3085: "yu", 0x3087: "yo"}
_SOKUON = 0x3063
_CHOON = 0x30FC      # katakana-hiragana prolonged sound mark

_HIRA_LO, _HIRA_HI = 0x3041, 0x3096
_KATA_LO, _KATA_HI = 0x30A1, 0x30F6


def _kana_base(cp: int) -> int | None:
    """Katakana folds onto hiragana (offset 0x60)."""
    if _HIRA_LO <= cp <= _HIRA_HI:
        return cp
    if _KATA_LO <= cp <= _KATA_HI:
        return cp - 0x60
    return None


def is_kana(cp: int) -> bool:
    return _kana_base(cp) is not None or cp == _CHOON


def kana_to_romaji(cps: list[int]) -> str:
    """Scan a maximal kana run → romaji (digraphs, sokuon, chōon)."""
    out: list[str] = []
    geminate = False
    for cp in cps:
        if cp == _CHOON:
            if out and out[-1] and out[-1][-1] in "aiueo":
                out.append(out[-1][-1])
            continue
        b = _kana_base(cp)
        if b is None:
            continue
        if b == _SOKUON:
            geminate = True
            continue
        if b in _SMALL_Y and out:
            prev = out[-1]
            if prev.endswith("shi") or prev.endswith("chi"):
                out[-1] = prev[:-1]                    # sha / cha
                out.append(_SMALL_Y[b][1:])            # drop the y
            elif prev.endswith("ji"):
                out[-1] = prev[:-1]
                out.append(_SMALL_Y[b][1:])            # ja / ju / jo
            elif prev.endswith("i"):
                out[-1] = prev[:-1]
                out.append(_SMALL_Y[b])                # kya / nyu ...
            else:
                out.append(_SMALL_Y[b])
            continue
        syll = _KANA_ROWS.get(b, "")
        if geminate and syll:
            syll = syll[0] + syll
            geminate = False
        out.append(syll)
    return "".join(out)


# --- Han: compact toneless pinyin table ------------------------------------

_HAN_PINYIN_SRC = """
一yi 二er 三san 四si 五wu 六liu 七qi 八ba 九jiu 十shi 百bai 千qian 万wan
人ren 大da 小xiao 中zhong 上shang 下xia 左zuo 右you 前qian 后hou 内nei 外wai
天tian 地di 山shan 水shui 火huo 木mu 金jin 土tu 石shi 田tian 日ri 月yue 星xing
年nian 分fen 时shi 国guo 家jia 王wang 民min 公gong 园yuan 广guang 场chang
市shi 省sheng 县xian 区qu 镇zhen 乡xiang 村cun 城cheng 都du 京jing 州zhou
北bei 南nan 东dong 西xi 路lu 街jie 道dao 桥qiao 门men 口kou 站zhan 港gang
河he 江jiang 湖hu 海hai 岛dao 湾wan 池chi 泉quan 溪xi 谷gu 岭ling 峰feng
林lin 森sen 花hua 草cao 树shu 叶ye 春chun 夏xia 秋qiu 冬dong
白bai 黑hei 红hong 黄huang 蓝lan 青qing 紫zi 银yin
新xin 旧jiu 高gao 长chang 短duan 远yuan 近jin 老lao 少shao
文wen 学xue 校xiao 院yuan 馆guan 寺si 庙miao 宫gong 塔ta 楼lou 亭ting 阁ge
店dian 厂chang 房fang 屋wu 室shi 堂tang 台tai 庄zhuang 营ying 堡bao 集ji
风feng 云yun 雨yu 雪xue 电dian 光guang 声sheng 色se 气qi
平ping 安an 和he 兴xing 福fu 寿shou 康kang 乐le 喜xi 爱ai 美mei 丽li
华hua 龙long 凤feng 虎hu 马ma 牛niu 羊yang 鸟niao 鱼yu 象xiang
第di 号hao 车che 铁tie 机ji 飞fei 船chuan 码ma 头tou 场chang
深shen 圳zhen 香xiang 澳ao 港gang
汉han 语yu 字zi 名ming 本ben 生sheng 先xian 会hui 社she 神shen 佛fo
武wu 成cheng 重chong 庆qing 沙sha 杭hang 苏su 宁ning 津jin 郑zheng 济ji
兰lan 贵gui 昆kun 拉la 萨sa 乌wu 鲁lu 齐qi 哈ha 尔er 滨bin 沈shen 阳yang
吉ji 太tai 原yuan 陕shan 甘gan 肃su 蒙meng 古gu 藏zang 疆jiang
川chuan 崎qi 横heng 浜bang 阪ban 奈nai 良liang 富fu 士shi 子zi 女nü 男nan
東dong 國guo 廣guang 灣wan 島dao 橋qiao 門men 車che 馬ma 龍long 鳳feng
漢han 鐵tie 陽yang 雲yun 莊zhuang 樂le 麗li 華hua 縣xian 鎮zhen 區qu
場chang 園yuan 橫heng 濱bin 蘇su 寧ning 鄭zheng 濟ji 蘭lan 貴gui 烏wu
魯lu 齊qi 瀋shen 陝shan 藍lan 紅hong 黃huang 綠lü 銀yin 長chang 風feng
電dian 聲sheng 愛ai 學xue 館guan 閣ge 廠chang 頭tou 飛fei 號hao 時shi
萬wan 廟miao 樹shu 葉ye 鳥niao 魚yu 馬ma 興xing 壽shou 紫zi 氣qi
綠lü 湖hu 灘tan 滩tan 坝ba 壩ba 井jing 泽ze 澤ze 洲zhou 浦pu 塘tang
岸an 坡po 崖ya 洞dong 石shi 岩yan 沟gou 溝gou 坪ping 垣yuan 关guan 關guan
""".split()

_HAN_PINYIN: dict[int, str] = {}
for _ent in _HAN_PINYIN_SRC:
    _HAN_PINYIN[ord(_ent[0])] = _ent[1:]

_HAN_RANGES = ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF))


def is_han(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _HAN_RANGES)


def han_pinyin(cp: int) -> str | None:
    return _HAN_PINYIN.get(cp)


# --- combined string folder -------------------------------------------------

def is_cjk(cp: int) -> bool:
    return (_HANGUL_BASE <= cp <= _HANGUL_END) or is_kana(cp) or is_han(cp)


def fold_cjk(s: str, fold_other) -> str:
    """Transliterate a string containing CJK codepoints; non-CJK chars
    go through ``fold_other(cp) -> str`` (the caller's table/NFKD
    fold).  Kana runs are scanned together (context for digraphs and
    gemination); consecutive han syllables get single spaces."""
    out: list[str] = []
    i = 0
    n = len(s)
    prev_han = False
    while i < n:
        cp = ord(s[i])
        if is_kana(cp):
            j = i
            run = []
            while j < n and is_kana(ord(s[j])):
                run.append(ord(s[j]))
                j += 1
            out.append(kana_to_romaji(run))
            i = j
            prev_han = False
            continue
        if _HANGUL_BASE <= cp <= _HANGUL_END:
            out.append(hangul_syllable(cp))
            prev_han = False
        elif is_han(cp):
            p = han_pinyin(cp)
            if p is None:
                out.append(s[i])        # documented residue: pass through
                prev_han = False
            else:
                if prev_han:
                    out.append(" ")
                out.append(p)
                prev_han = True
            i += 1
            continue
        else:
            out.append(fold_other(cp))
            prev_han = False
        i += 1
    return "".join(out)
