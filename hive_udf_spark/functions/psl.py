"""Public-suffix rules for eTLD+1 (registrable-domain) extraction.

Data vendored from the publicsuffix.org list format (public data,
https://publicsuffix.org/list/): three rule classes exactly as the PSL
defines them —

- **normal** multi-label suffixes (``co.uk`` → registrable domain keeps
  one extra label: ``shop.co.uk``),
- **wildcard** rules (``*.ck`` → any single label under ``ck`` is itself
  a public suffix, so ``a.b.ck`` is registrable),
- **exception** rules (``!www.ck`` → ``www.ck`` is registrable despite
  the wildcard).

Single-label TLDs need no rule (the two-label fallback in
``functions/url.py`` covers them).  The vendored set below is a curated
subset of the ICANN + private sections — the full ~9k-line list is a
DATA swap: drop ``public_suffix_list.dat`` anywhere and point
``load_psl(path)`` at it; ``parse_psl`` understands the real file format
(comments, section markers, ``*.``/``!`` prefixes).  IDN rules
(non-ASCII) are skipped on load: the URL canonicalizer excludes
non-ASCII hosts from canonical identity rather than mismerging them,
and punycode (``xn--``) labels pass through as opaque labels.

Reference parity note: the reference engine (MLnick/hive-udf,
UDAFCardinalityEstimator.java) has no URL/PSL surface — this backs the
mandated web-pipeline extension (SURVEY.md §2.3), from public PSL
semantics only.
"""

from __future__ import annotations

__all__ = [
    "NORMAL_RULES",
    "WILDCARD_RULES",
    "EXCEPTION_RULES",
    "parse_psl",
    "load_psl",
]

# --- ICANN section: country second-level registries (curated subset) ---
_ICANN = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk police.uk
ac.jp ad.jp co.jp ed.jp go.jp gr.jp lg.jp ne.jp or.jp
aichi.jp akita.jp aomori.jp chiba.jp ehime.jp fukui.jp fukuoka.jp
fukushima.jp gifu.jp gunma.jp hiroshima.jp hokkaido.jp hyogo.jp ibaraki.jp
ishikawa.jp iwate.jp kagawa.jp kagoshima.jp kanagawa.jp kochi.jp kumamoto.jp
kyoto.jp mie.jp miyagi.jp miyazaki.jp nagano.jp nagasaki.jp nara.jp
niigata.jp oita.jp okayama.jp okinawa.jp osaka.jp saga.jp saitama.jp
shiga.jp shimane.jp shizuoka.jp tochigi.jp tokushima.jp tokyo.jp tottori.jp
toyama.jp wakayama.jp yamagata.jp yamaguchi.jp yamanashi.jp
com.au net.au org.au edu.au gov.au asn.au id.au
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz maori.nz
com.br net.br org.br gov.br edu.br mil.br adv.br art.br blog.br eco.br
ind.br inf.br jus.br med.br mus.br pro.br rec.br srv.br tur.br tv.br vet.br
co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in gov.in mil.in
nic.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn
ah.cn bj.cn cq.cn fj.cn gd.cn gs.cn gx.cn gz.cn ha.cn hb.cn he.cn hi.cn
hl.cn hn.cn jl.cn js.cn jx.cn ln.cn nm.cn nx.cn qh.cn sc.cn sd.cn sh.cn
sn.cn sx.cn tj.cn xj.cn xz.cn yn.cn zj.cn
co.za net.za org.za gov.za ac.za web.za mil.za nom.za school.za law.za
co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr sc.kr
com.mx net.mx org.mx edu.mx gob.mx
com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar tur.ar
com.tr net.tr org.tr gov.tr edu.tr mil.tr gen.tr web.tr av.tr dr.tr bel.tr
pol.tr k12.tr
com.sg net.sg org.sg gov.sg edu.sg per.sg
co.id net.id or.id web.id ac.id sch.id go.id mil.id my.id biz.id desa.id
co.il net.il org.il ac.il gov.il k12.il muni.il idf.il
co.th net.th or.th ac.th go.th in.th mi.th
com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua kyiv.ua lviv.ua odessa.ua
kharkov.ua donetsk.ua crimea.ua
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn name.vn
pro.vn health.vn
com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph
com.my net.my org.my gov.my edu.my mil.my name.my
com.tw net.tw org.tw edu.tw gov.tw mil.tw idv.tw game.tw ebiz.tw club.tw
com.hk net.hk org.hk edu.hk gov.hk idv.hk
com.pl net.pl org.pl edu.pl gov.pl info.pl biz.pl mil.pl waw.pl wroc.pl
krakow.pl poznan.pl lodz.pl gda.pl szczecin.pl
com.gr net.gr org.gr edu.gr gov.gr
com.pt edu.pt gov.pt int.pt net.pt nome.pt org.pt publ.pt
com.ro org.ro tm.ro nt.ro nom.ro info.ro rec.ro arts.ro firm.ro store.ro
www.ro
com.es nom.es org.es gob.es edu.es
asso.fr com.fr gouv.fr nom.fr prd.fr tm.fr avocat.fr aeroport.fr
gov.it edu.it
com.eg edu.eg eun.eg gov.eg mil.eg name.eg net.eg org.eg sci.eg
com.sa net.sa org.sa gov.sa med.sa pub.sa edu.sa sch.sa
co.ae net.ae org.ae sch.ae ac.ae gov.ae mil.ae
com.pk net.pk edu.pk org.pk fam.pk biz.pk web.pk gov.pk gob.pk gok.pk
gon.pk gop.pk gos.pk
com.lk org.lk edu.lk ngo.lk soc.lk web.lk ltd.lk assn.lk grp.lk hotel.lk
ac.lk gov.lk sch.lk net.lk int.lk
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
com.ng edu.ng gov.ng i.ng mil.ng mobi.ng name.ng net.ng org.ng sch.ng
com.gh edu.gh gov.gh org.gh mil.gh
co.tz ac.tz go.tz hotel.tz info.tz me.tz mil.tz mobi.tz ne.tz or.tz sc.tz
tv.tz
co.ug or.ug ac.ug sc.ug go.ug ne.ug com.ug org.ug
ac.zm biz.zm co.zm com.zm edu.zm gov.zm info.zm mil.zm net.zm org.zm sch.zm
ac.zw co.zw gov.zw mil.zw org.zw
ac.ma co.ma gov.ma net.ma org.ma press.ma
com.mu net.mu org.mu gov.mu ac.mu co.mu or.mu
com.co net.co org.co edu.co gov.co mil.co nom.co arts.co firm.co info.co
int.co rec.co web.co
com.ec info.ec net.ec fin.ec k12.ec med.ec pro.ec org.ec edu.ec gov.ec
gob.ec mil.ec
com.pe org.pe net.pe edu.pe mil.pe gob.pe nom.pe
com.uy edu.uy gub.uy mil.uy net.uy org.uy
com.py coop.py edu.py gov.py mil.py net.py org.py
com.bo edu.bo gob.bo int.bo org.bo net.bo mil.bo tv.bo web.bo
gob.cl gov.cl mil.cl
ac.cr co.cr ed.cr fi.cr go.cr or.cr sa.cr
com.do edu.do org.do net.do gov.do gob.do web.do art.do sld.do mil.do
com.gt edu.gt gob.gt ind.gt mil.gt net.gt org.gt
com.hn edu.hn org.hn net.hn mil.hn gob.hn
co.ni com.ni edu.ni mil.ni net.ni nom.ni org.ni gob.ni
ac.pa gob.pa com.pa org.pa sld.pa edu.pa net.pa ing.pa abo.pa med.pa nom.pa
com.sv edu.sv gob.sv org.sv red.sv
arts.ve co.ve com.ve e12.ve edu.ve firm.ve gob.ve gov.ve info.ve int.ve
mil.ve net.ve org.ve rec.ve store.ve tec.ve web.ve
gc.ca ab.ca bc.ca mb.ca nb.ca nl.ca ns.ca nt.ca nu.ca on.ca pe.ca qc.ca
sk.ca yk.ca
fed.us isa.us nsn.us dni.us kids.us
al.us ak.us az.us ar.us ca.us co.us ct.us dc.us de.us fl.us ga.us hi.us
ia.us id.us il.us in.us ks.us ky.us la.us ma.us md.us me.us mi.us mn.us
mo.us ms.us mt.us nc.us nd.us ne.us nh.us nj.us nm.us nv.us ny.us oh.us
ok.us or.us pa.us ri.us sc.us sd.us tn.us tx.us ut.us va.us vt.us wa.us
wi.us wv.us wy.us
ac.at co.at gv.at or.at
ac.be
mil.no stat.no dep.no kommune.no herad.no priv.no vgs.no fhs.no museum.no
idrett.no folkebibl.no fylkesbibl.no
com.se org.se pp.se tm.se parti.se press.se
aland.fi
net.is com.is edu.is gov.is org.is int.is
gov.ie
gov.lt
com.lv edu.lv gov.lv org.lv mil.lv id.lv net.lv asn.lv conf.lv
com.ee org.ee edu.ee gov.ee riik.ee lib.ee med.ee pri.ee aip.ee fie.ee
co.hu info.hu org.hu priv.hu sport.hu tm.hu city.hu film.hu forum.hu
games.hu hotel.hu media.hu news.hu shop.hu suli.hu video.hu
com.hr iz.hr from.hr name.hr
ac.rs co.rs edu.rs gov.rs in.rs org.rs
com.ba edu.ba gov.ba mil.ba net.ba org.ba
com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
com.al edu.al gov.al mil.al net.al org.al
co.me net.me org.me edu.me ac.me gov.me its.me priv.me
com.ge edu.ge gov.ge org.ge mil.ge net.ge pvt.ge
co.am com.am commune.am net.am org.am
com.az net.az int.az gov.az org.az edu.az info.az pp.az mil.az name.az
pro.az biz.az
org.kz edu.kz net.kz gov.kz mil.kz com.kz
co.uz com.uz net.uz org.uz
org.kg net.kg com.kg edu.kg gov.kg mil.kg
ac.ir co.ir gov.ir id.ir net.ir org.ir sch.ir
gov.iq edu.iq mil.iq com.iq org.iq net.iq
com.jo org.jo net.jo edu.jo sch.jo gov.jo mil.jo name.jo
com.lb edu.lb gov.lb net.lb org.lb
com.kw edu.kw emb.kw gov.kw ind.kw net.kw org.kw
com.qa edu.qa gov.qa mil.qa name.qa net.qa org.qa sch.qa
co.om com.om edu.om gov.om med.om museum.om net.om org.om pro.om
com.bh edu.bh net.bh org.bh gov.bh
edu.sy gov.sy net.sy mil.sy com.sy org.sy
com.ly net.ly gov.ly plc.ly edu.ly sch.ly med.ly org.ly id.ly
com.tn ens.tn fin.tn gov.tn ind.tn intl.tn nat.tn net.tn org.tn info.tn
perso.tn tourism.tn
com.dz org.dz net.dz gov.dz edu.dz asso.dz pol.dz art.dz
com.et gov.et org.et edu.et biz.et name.et info.et net.et
com.sd net.sd org.sd edu.sd med.sd tv.sd gov.sd info.sd
"""

# --- private section (curated): hosting platforms whose subdomains are
# independent sites — exactly why the PSL private section exists.
_PRIVATE = """
github.io gitlab.io blogspot.com s3.amazonaws.com cloudfront.net
herokuapp.com netlify.app vercel.app web.app firebaseapp.com
azurewebsites.net cloudapp.net appspot.com pages.dev workers.dev fly.dev
onrender.com readthedocs.io surge.sh glitch.me ngrok.io dyndns.org
"""

NORMAL_RULES: tuple[str, ...] = tuple(
    sorted(set(_ICANN.split()) | set(_PRIVATE.split()))
)

# ``*.X`` — every single label under X is itself a public suffix.
WILDCARD_RULES: tuple[str, ...] = (
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg", "ye",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    "compute.amazonaws.com", "elb.amazonaws.com",
)

# ``!X`` — X is registrable despite a covering wildcard.
EXCEPTION_RULES: tuple[str, ...] = (
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)


def parse_psl(text: str) -> tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]:
    """Parse the real ``public_suffix_list.dat`` format into
    (normal, wildcard, exception) rule tuples.  Comments (``//``),
    blank lines, and non-ASCII (IDN) rules are skipped; single-label
    normal rules are skipped too (the two-label fallback covers them)."""
    normal: list[str] = []
    wildcard: list[str] = []
    exception: list[str] = []
    for line in text.splitlines():
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        rule = rule.split()[0]
        if not rule.isascii():
            continue
        if rule.startswith("!"):
            exception.append(rule[1:].lower())
        elif rule.startswith("*."):
            wildcard.append(rule[2:].lower())
        elif "." in rule:
            normal.append(rule.lower())
    return tuple(sorted(set(normal))), tuple(sorted(set(wildcard))), tuple(
        sorted(set(exception))
    )


def load_psl(
    path: str | None = None,
) -> tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]:
    """Rules for the canonicalizer: the vendored set, or — the literal
    data swap — a real PSL file if ``path`` is given."""
    if path is None:
        return NORMAL_RULES, WILDCARD_RULES, EXCEPTION_RULES
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh.read())
