package graft.functions

/** fastText-style language identification: hashed character 1/2/3-gram
  * features into a TRAINED linear softmax layer (round 4 — previously a
  * cosine-to-centroid scorer; the trained head is the architecture the
  * north star names). Entirely deterministic — the model trains at
  * class-init from the frozen seed corpora below (public common words)
  * with StrictMath arithmetic in a fixed order, so every executor JVM
  * materializes identical weights with no broadcast and no model files.
  * This plays the role of the reference's delegated MEASURE() model
  * measures (weiser/checks/numeric.py:18-26): a named measure computed
  * by an external model rather than a SQL expression.
  */
object LangId extends Serializable {

  val langs: Array[String] =
    Array("en", "es", "fr", "de", "zh", "it", "pt", "nl", "ru", "ja",
      "pl", "ko", "sv", "tr", "id", "vi", "ar", "hi", "th")

  /** Frozen seed corpora: the most common function words per language,
    * plus (round 3) a band of high-frequency CONTENT words — a profile
    * built only from function words under-represents documents that
    * carry few of them (lists, titles, technical text), which let
    * orthographically-light neighbors (it/pt vowel endings) outscore en
    * on keyword-heavy English. The fixture corpus snapshots its own
    * vocabulary (sources/GoldenCorpus.vocab), so enriching these does not
    * rewrite fixture text.
    */
  private[graft] val seeds: Map[String, String] = Map(
    "en" -> ("the be to of and a in that have it for not on with he as you " +
      "do at this but his by from they we say her she or an will my one all " +
      "would there their what so up out if about who get which go me when " +
      "make can like time no just him know take people into year your good " +
      "some could them see other than then now look only come its over think " +
      "also back after use two how our work first well way even new want " +
      "because any these give day most us is was are been has had were said " +
      "world school state family student group country problem hand part " +
      "place case week company system program question number night point " +
      "home water room area money story fact month right study book word " +
      "business side kind head house service power hour game line end " +
      "member law city name team minute idea body information data level " +
      "office door health person result change morning reason research"),
    "es" -> ("de la que el en y a los del se las por un para con no una su " +
      "al lo como más pero sus le ya o este sí porque esta entre cuando muy " +
      "sin sobre también me hasta hay donde quien desde todo nos durante " +
      "todos uno les ni contra otros ese eso ante ellos e esto mí antes " +
      "algunos qué unos yo otro otras otra él tanto esa estos mucho quienes " +
      "nada muchos cual poco ella estar estas algunas algo nosotros " +
      "tiempo vida día mundo casa hombre parte año país ciudad trabajo " +
      "mujer caso cosa forma gobierno momento lugar manera semana historia " +
      "agua noche familia persona mano grupo problema palabra punto hora"),
    "fr" -> ("de la le et les des en un du une que est pour qui dans a par " +
      "plus pas au sur ne se ce il sont la aux avec son ont cette mais ou où " +
      "leur elle si tout comme nous sa ses mais été sont être avoir fait " +
      "faire peut tous après autre bien deux même notre ans entre sans elle " +
      "très votre aussi celui dont leurs moins ceux eux quelques toutes " +
      "toujours alors depuis donc quand encore vers chez quel quelle " +
      "temps vie monde jour maison homme année pays ville travail femme " +
      "cas chose forme gouvernement moment lieu manière semaine histoire " +
      "eau nuit famille personne main groupe problème mot point heure"),
    "de" -> ("der die und in den von zu das mit sich des auf für ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach wird " +
      "bei einer um am sind noch wie einem über einen so zum war haben nur " +
      "oder aber vor zur bis mehr durch man sein wurde sei während zwischen " +
      "immer wieder gegen vom ganz einzelnen wo muss ohne eines können sehr " +
      "schon wenn hier alle diese seinem wäre ihren jahre mich " +
      "zeit leben welt tag haus mann jahr land stadt arbeit frau fall " +
      "sache form regierung moment ort weise woche geschichte wasser " +
      "nacht familie mensch hand gruppe problem wort punkt stunde kinder"),
    "zh" -> ("的一是在不了有和人这中大为上个国我以要他时来用们生到作地" +
      "于出就分对成会可主发年动同工也能下过子说产种面而方后多定行学法" +
      "所民得经十三之进着等部度家电力里如水化高自二理起小物现实加量都" +
      "两体制机当使点从业本去把性好应开它 我们的 他们在 一个人 这是一" +
      "个 大的国家 在学校 中文和 学习的 他们的 我们在 是一个 有一个"),
    // round-3 depth expansion: five more languages (two new scripts).
    // Same recipe — the language's most common function words, public
    // frequency-list knowledge, frozen.
    "it" -> ("di e il la che in a per un è non sono una con si da come le " +
      "dei più nel alla ma lo se gli anche della questo sua suo loro ha " +
      "hanno essere fare del i al negli sulla questi molto dove quando " +
      "perché cosa tutti tutto ancora dopo prima senza sotto sopra tra fra " +
      "può deve stato erano era così ogni altri altre quale quali mentre " +
      "contro già sempre qui oggi anni anno casa vita tempo uomo parte " +
      "mondo giorno modo città paese stesso quella quelle nella delle " +
      "sono stati essere aveva fatto grande nuovo primo due tre volta"),
    "pt" -> ("de a o que e do da em um para é com não uma os no se na por " +
      "mais as dos como mas foi ao ele das tem à seu sua ou ser quando " +
      "muito há nos já está eu também só pelo pela até isso ela entre era " +
      "depois sem mesmo aos ter seus quem nas me esse eles estão você " +
      "tinha foram essa num nem suas meu às minha têm numa pelos elas " +
      "havia seja qual será nós tenho lhe deles essas esses pelas este " +
      "fosse dele anos ano casa vida tempo homem parte mundo dia modo " +
      // distinctively-Portuguese orthography (ção/lh/nh/ã — es uses ción,
      // ll, ñ): without these the profile loses short pt text to es
      "coração canção informação situação não então irmão mão manhã " +
      "amanhã senhor senhora trabalho filho melhor mulher velho olhos " +
      "conhecimento nação atenção opinião questão posição direção " +
      "relação população região educação geração condições ações"),
    "nl" -> ("de het een en van in is dat op te zijn voor met als niet aan " +
      "er om door maar dan ook bij nog naar uit dit over hij wordt worden " +
      "werd wel kan moet heeft hebben had geen meer al toen onder tussen " +
      "tegen deze die ze we ik je hun na mijn zou kunnen veel waar hoe wat " +
      "wie alle andere twee eerste nieuwe grote tijd jaar mensen werk land " +
      "werden omdat zelf tot haar hem ons onze jullie zij iets niets " +
      "alleen steeds altijd samen tijdens volgens vooral echter daarom"),
    "ru" -> ("и в не на я что он с как это она по но они к у из за то все " +
      "мы о так же бы был от для вот кто да его ему ни теперь когда уже " +
      "если или него вы меня есть нет ещё только себя своей было были " +
      "быть может очень при мне ей чем чтобы раз тоже себе под будет " +
      "потом нас ним где даже ведь там здесь этот тот наш один два три " +
      "человек время жизнь день год рука дело слово место лицо голова " +
      "работа россия город страна мир дом сказал говорит между после"),
    "ja" -> ("の に は を た が で て と し れ さ ある いる も する から " +
      "な こと として い や など なっ ない この ため その あっ よう また " +
      "もの という あり まで られ なる へ か だ これ によって により おり " +
      "より による ず なり られる において ば なかっ なく しかし について " +
      "せ だっ できる それ う ので なお のみ でき き つ における および " +
      "いう さらに でも ら たり ます ん なら に対して 特に せる 及び " +
      "これら とき では にて ほか ながら うち そして とともに ただし " +
      "かつて それぞれ または 日本 年 月 日 人 大きな 小さな 新しい"),
    // round-4 depth expansion: two more languages (one new script). Same
    // recipe — the language's most common function words plus a band of
    // content words, public frequency-list knowledge, frozen. Polish
    // carries its distinctive digraph/diacritic orthography (cz/sz/rz,
    // ą/ę/ł/ż/ś); Korean is hangul — particles plus common nouns/verb
    // forms.
    "pl" -> ("nie to się w na i z co jest że do tak jak o mnie a ale mi po " +
      "ja za tu ty już tylko jej go tego jestem może pan dla ciebie coś " +
      "tym być ma cię mam was wszystko nic tam więc jeszcze dobrze będzie " +
      "czy gdzie teraz chcę wiem przez ten musi ich nas mój bardzo sobie " +
      "kiedy która które który też przed od przy bez nad pod między " +
      "podczas właśnie można trzeba jednak dlatego ponieważ oraz także " +
      "również innych każdy wszystkich czas dzień świat dom człowiek rok " +
      "ręka praca słowo miejsce miasto kraj woda noc rodzina osoba grupa " +
      "problem punkt godzina dziecko kobieta mężczyzna szkoła państwo " +
      "życie historia pytanie liczba informacja badanie zmiana powód " +
      "wynik zdrowie biuro drzwi jeszcze wszystkim którzy została zostały"),
    "ko" -> ("이 그 저 것 수 들 등 및 에서 그리고 하지만 그러나 우리 당신 " +
      "사람 시간 생활 세계 하루 집 남자 여자 학교 나라 물 밤 가족 사람들 " +
      "그룹 문제 말 장소 도시 일 년 월 손 머리 마음 때문 위해 대한 통해 " +
      "있는 없는 하는 되는 같은 다른 모든 어떤 이런 그런 한국 서울 오늘 " +
      "내일 어제 지금 여기 거기 무엇 누구 언제 어디 왜 어떻게 은 는 가 " +
      "을 를 에 의 로 와 과 도 만 까지 부터 보다 처럼 에게 한다 했다 " +
      "있다 없다 된다 합니다 있습니다 없습니다 때 곳 말했다 생각 경우 " +
      "정도 이후 동안 모두 다시 함께 바로 가장 매우 아주 너무 정말"),
    // round-5 depth expansion: six more languages, two new scripts
    // (Arabic, Devanagari). Same recipe — public frequency-list function
    // words plus a content band, frozen. Swedish keeps its å/ä/ö
    // orthography (the de/nl-neighbor discriminator); Turkish its
    // dotless-ı/ş/ğ; Vietnamese its dense diacritics.
    "sv" -> ("och att det som en på är av för med den till i inte om han " +
      "hon de vi jag du sig men ett har var kan ska skulle från eller när " +
      "vad där så här efter under över mellan också bara mycket alla andra " +
      "några vilket sedan redan kanske därför genom utan hos vid ännu sina " +
      "hade blev vara bli denna detta dessa vilka honom henne dem oss er " +
      "din min sin vår deras någon något inga många både även fått går " +
      "tid liv värld dag hus man år land stad arbete kvinna fall sak form " +
      "regering ögonblick plats sätt vecka historia vatten natt familj " +
      "människa hand grupp problem ord punkt timme barn skola språk fråga " +
      "nummer kväll pengar berättelse månad rätt studie bok företag sida"),
    "tr" -> ("bir ve bu için de da ne gibi ile daha çok o ben sen biz siz " +
      "onlar ama ki mi var yok olan olarak sonra kadar göre her şey en az " +
      "önce şimdi burada nerede nasıl neden çünkü eğer ise değil hem ya " +
      "zaman ancak bütün kendi başka yine böyle şöyle bunu bunun onun " +
      "bana sana bize size beni seni bizi sizi benim senin bizim sizin " +
      "diye dedi oldu olur olmak etmek yapmak gelmek gitmek görmek almak " +
      "vermek bilmek istemek demek bulmak kalmak durmak geçmek çıkmak " +
      "hayat dünya gün ev adam yıl ülke şehir iş kadın durum biçim " +
      "hükümet an yer hafta tarih su gece aile insan el grup sorun " +
      "kelime nokta saat çocuk okul dil soru sayı akşam para öykü ay hak"),
    "id" -> ("yang dan di itu dengan untuk tidak ini dari dalam akan pada " +
      "juga saya kita dia mereka kami anda ada bisa sudah telah harus atau " +
      "tetapi karena jika ketika seperti lebih sangat hanya masih semua " +
      "setiap banyak sedikit antara tanpa sampai sejak oleh agar supaya " +
      "namun bahwa adalah menjadi membuat mengatakan melihat datang pergi " +
      "tahu ingin bilang menemukan tinggal berhenti lewat keluar ialah " +
      "orang waktu hidup dunia hari rumah tahun negara kota kerja " +
      "perempuan kasus hal bentuk pemerintah saat tempat cara minggu " +
      "sejarah air malam keluarga tangan kelompok masalah kata titik jam " +
      "anak sekolah bahasa pertanyaan nomor sore uang cerita bulan hasil"),
    "vi" -> ("của và là có không được một người trong cho với những này " +
      "khi đã các để tôi anh chị em chúng ta họ bạn rất cũng như thì mà " +
      "lại còn nếu vì sao đây đó nơi từ về sau trước trên dưới giữa ngoài " +
      "bên theo cùng nhưng nên phải sẽ đang bị ra vào lên xuống đến đi " +
      "làm nói thấy biết muốn tìm ở lại qua khỏi thành bởi rằng điều gì " +
      "thời gian cuộc sống thế giới ngày nhà năm đất nước thành phố công " +
      "việc phụ nữ trường hợp hình thức chính phủ lúc chỗ cách tuần lịch " +
      "sử nước đêm gia đình bàn tay nhóm vấn đề điểm giờ trẻ con trường " +
      "học ngôn ngữ câu hỏi số buổi tối tiền câu chuyện tháng kết quả"),
    "ar" -> ("في من على أن إلى عن مع هذا هذه التي الذي كان كانت هو هي هم " +
      "نحن أنا أنت لا ما لم لن قد كل بعد قبل عند غير بين حتى إذا لكن ثم " +
      "أو كما منذ حيث الى التى ذلك تلك هناك هنا عندما لماذا كيف أين متى " +
      "لأن لكي سوف ليس كانوا يكون تكون أكثر أقل جدا فقط أيضا ضد خلال " +
      "حول دون لدى عبر نفس بعض جميع أي شيء " +
      "وقت حياة عالم يوم بيت رجل سنة بلد مدينة عمل امرأة حالة شكل حكومة " +
      "لحظة مكان طريقة أسبوع تاريخ ماء ليل عائلة إنسان يد مجموعة مشكلة " +
      "كلمة نقطة ساعة طفل مدرسة لغة سؤال رقم مساء مال قصة شهر نتيجة حق"),
    "hi" -> ("के में है और की से का को पर यह कि नहीं एक हैं था थी थे हो " +
      "गया कर रहा रही तो भी जो वह मैं हम आप वे कुछ सब अपने लिए साथ बाद " +
      "पहले अब यहाँ वहाँ कब कैसे क्यों अगर लेकिन फिर या जब तक बहुत ही " +
      "इस उस ये वो कोई किसी मुझे तुम उसे हमें उन्हें मेरा तेरा उसका " +
      "हमारा उनका अपना दो तीन चार होता होती होते करता करती करते किया " +
      "करना होना जाना आना देखना कहना जानना चाहना मिलना रहना लगना देना " +
      "समय जीवन दुनिया दिन घर आदमी साल देश शहर काम औरत मामला चीज़ रूप " +
      "सरकार पल जगह तरीका सप्ताह इतिहास पानी रात परिवार इंसान हाथ समूह " +
      "समस्या शब्द बिंदु घंटा बच्चा स्कूल भाषा सवाल संख्या शाम पैसा " +
      "कहानी महीना नतीजा अधिकार"),
    // Thai script (one more script; tone/vowel marks are \p{M} — the
    // combining-mark symbol fix covers them). Real Thai writes without
    // inter-word spaces; like zh, the seed/fixture corpora use the
    // segmented shape and the char-n-gram featurizer needs no
    // segmentation at inference.
    "th" -> ("ที่ และ ใน ของ มี ไม่ ให้ ได้ ว่า เป็น การ จะ ไป มา กับ แต่ " +
      "ก็ อยู่ คน นี้ นั้น ซึ่ง จาก โดย เมื่อ ถ้า เพราะ หรือ แล้ว ยัง ต้อง " +
      "ถูก เขา เรา ฉัน คุณ มัน พวก ทุก บาง อีก มาก น้อย ดี ใหม่ ใหญ่ เล็ก " +
      "ทำ รู้ เห็น คิด พูด บอก ถาม ตอบ ใช้ หา เอา วัน เวลา ชีวิต โลก " +
      "บ้าน ผู้ชาย ปี ประเทศ เมือง งาน ผู้หญิง กรณี สิ่ง รูปแบบ รัฐบาล " +
      "ขณะ สถานที่ วิธี สัปดาห์ ประวัติ น้ำ คืน ครอบครัว มือ กลุ่ม ปัญหา " +
      "คำ จุด ชั่วโมง เด็ก โรงเรียน ภาษา คำถาม จำนวน เย็น เงิน เรื่อง " +
      "เดือน ผล สิทธิ หัว ใจ ตา")
  )

  val dim: Int = 1 << 12

  /** trim().isEmpty without the trim allocation (String.trim strips
    * chars <= 0x20).
    */
  @inline private[functions] def allBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) > ' ') return false; i += 1 }
    true
  }

  /** Char of the VIRTUAL padded-lowercase view " text " at index i — no
    * per-document lowercase/concat copies (the pipeline's 32-thread
    * ceiling is allocation rate, not arithmetic). Per-char
    * Character.toLowerCase; featurize and predict share this exact view,
    * so model and scorer stay bit-consistent.
    */
  @inline private[functions] def cAt(s: String, i: Int, len: Int): Char =
    if (i == 0 || i == len - 1) ' '
    else Character.toLowerCase(s.charAt(i - 1))

  /** FNV-1a over the n-gram's UTF-16 code units — stable across JVMs. */
  @inline private def fnv1a(s: String, from: Int, until: Int, len: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) {
      h ^= cAt(s, i, len).toInt
      h *= 0x01000193
      i += 1
    }
    (h & Int.MaxValue) % dim
  }

  /** Hashed char 1/2/3-gram count vector over " text " (padded), L2-normed.
    * The 1-grams carry the character-inventory signal (decisive for CJK vs
    * Latin scripts); 2/3-grams carry the orthographic signal.
    */
  def featurize(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null || text.isEmpty) return v
    val len = text.length + 2 // virtual " text " view
    // whitespace-only grams are skipped: the bare space gram is the single
    // most common feature of EVERY space-delimited language, so it swamps
    // the cosine with language-free mass (and biases unsegmented scripts
    // against segmented ones)
    @inline def allSpace(from: Int, until: Int): Boolean = {
      var k = from
      while (k < until) { if (cAt(text, k, len) != ' ') return false; k += 1 }
      true
    }
    var i = 0
    while (i < len - 1) {
      if (!allSpace(i, i + 1)) v(fnv1a(text, i, i + 1, len)) += 1f
      if (!allSpace(i, i + 2)) v(fnv1a(text, i, i + 2, len)) += 1f
      if (i < len - 2 && !allSpace(i, i + 3)) v(fnv1a(text, i, i + 3, len)) += 1f
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    val n = math.sqrt(norm).toFloat
    if (n > 0) { j = 0; while (j < dim) { v(j) /= n; j += 1 } }
    v
  }

  /** Per-language profile vectors (the round-3 centroid model; kept as
    * the deterministic INITIALIZATION of the trained layer below).
    */
  lazy val profiles: Array[Array[Float]] = langs.map(l => featurize(seeds(l)))

  /** Mean-normalized sparse features of `text`: (bucket ids, counts /
    * totalGrams, totalGrams). EXACTLY the feature map the streaming
    * scorer in [[predict]] applies — same grams, same hashes, same
    * normalization (sum of per-gram weight reads divided by gram count)
    * — so weights trained on these features score identically at
    * inference. Training-time only; inference never materializes a
    * vector.
    */
  private[functions] def meanFeaturize(text: String): (Array[Int], Array[Float], Int) = {
    val counts = new Array[Int](dim)
    val len = text.length + 2
    @inline def allSpace(from: Int, until: Int): Boolean = {
      var k = from
      while (k < until) { if (cAt(text, k, len) != ' ') return false; k += 1 }
      true
    }
    var grams = 0
    var i = 0
    while (i < len - 1) {
      if (!allSpace(i, i + 1)) { counts(fnv1a(text, i, i + 1, len)) += 1; grams += 1 }
      if (!allSpace(i, i + 2)) { counts(fnv1a(text, i, i + 2, len)) += 1; grams += 1 }
      if (i < len - 2 && !allSpace(i, i + 3)) {
        counts(fnv1a(text, i, i + 3, len)) += 1; grams += 1
      }
      i += 1
    }
    val idx = Array.newBuilder[Int]
    val vals = Array.newBuilder[Float]
    var h = 0
    while (h < dim) {
      if (counts(h) > 0) { idx += h; vals += counts(h).toFloat / grams }
      h += 1
    }
    (idx.result(), vals.result(), grams)
  }

  /** TRAINED linear softmax head (round 4 — the fastText-style shape the
    * north star names: hashed char n-gram features into a linear layer
    * with softmax, discriminatively trained). Training is fully
    * deterministic and runs once per JVM at class init (~1 s): examples
    * are 6-word sliding windows (stride 3) over the frozen seed corpora,
    * the optimizer is plain example-ordered SGD on softmax cross-entropy
    * with a linearly-decayed rate (the fastText schedule), arithmetic is
    * StrictMath so every executor materializes bit-identical weights.
    * Initialized from the round-3 centroid profiles, so training refines
    * the generative solution discriminatively (down-weighting grams
    * shared between orthographic neighbors like es/pt instead of letting
    * them vote for both).
    */
  private lazy val trainedModel: Array[Float] = {
    val n = langs.length
    val examples: Array[(Int, Array[Int], Array[Float])] =
      langs.zipWithIndex.flatMap { case (l, k) =>
        val ws = seeds(l).split("\\s+").filter(_.nonEmpty)
        ws.sliding(6, 3).map { w =>
          val (idx, vals, _) = meanFeaturize(w.mkString(" "))
          (k, idx, vals)
        }
      }.toArray
    val w = Array.tabulate(n, dim)((k, h) => profiles(k)(h).toDouble)
    // NO bias term: the window counts per language are imbalanced (seed
    // lengths differ), and a learned bias just encodes that spurious
    // prior (measured: everything collapses to the most-windowed class).
    // Gradients are additionally class-balanced for the same reason.
    val classWeight: Array[Double] = {
      val cnt = new Array[Int](n)
      examples.foreach { case (k, _, _) => cnt(k) += 1 }
      val mean = examples.length.toDouble / n
      cnt.map(c => mean / c)
    }
    val epochs = 40
    val lr0 = 1.0
    val totalSteps = epochs.toLong * examples.length
    var step = 0L
    val s = new Array[Double](n)
    var e = 0
    while (e < epochs) {
      var x = 0
      while (x < examples.length) {
        val (label, idx, vals) = examples(x)
        val lr = lr0 * (1.0 - step.toDouble / totalSteps) * classWeight(label)
        var k = 0
        while (k < n) {
          var d = 0.0
          var j = 0
          while (j < idx.length) { d += w(k)(idx(j)) * vals(j); j += 1 }
          s(k) = d
          k += 1
        }
        var mx = s(0); k = 1
        while (k < n) { if (s(k) > mx) mx = s(k); k += 1 }
        var z = 0.0; k = 0
        while (k < n) { s(k) = StrictMath.exp(s(k) - mx); z += s(k); k += 1 }
        k = 0
        while (k < n) {
          val g = s(k) / z - (if (k == label) 1.0 else 0.0)
          val lg = lr * g
          var j = 0
          while (j < idx.length) { w(k)(idx(j)) -= lg * vals(j); j += 1 }
          k += 1
        }
        step += 1
        x += 1
      }
      e += 1
    }
    // interleave bucket-major for the streaming scorer: packed(h*n + k) —
    // one gram lookup touches one cache line for ALL languages
    val p = new Array[Float](dim * n)
    var h = 0
    while (h < dim) {
      var k = 0
      while (k < n) { p(h * n + k) = w(k)(h).toFloat; k += 1 }
      h += 1
    }
    p
  }

  private lazy val packed: Array[Float] = trainedModel

  /** (predicted lang, softmax confidence). Empty text -> ("und", 0.0).
    *
    * Streaming scorer: the dot product against each profile is linear in
    * gram occurrences, so grams are streamed straight into one accumulator
    * per language — no per-document feature vector is materialized (the
    * dense formulation allocates dim*4 bytes and does langs*dim multiplies
    * PER DOCUMENT; at 10^12 documents that allocation churn is the
    * pipeline's hot loop). Scores are per-gram means, so document length
    * cancels; prediction is identical to the dense cosine argmax because
    * the document norm is constant across languages.
    */
  def predict(text: String): (String, Double) = {
    if (text == null || text.isEmpty || allBlank(text)) return ("und", 0.0)
    val len = text.length + 2 // virtual " text " view, no copies
    val nLangs = langs.length
    val scores = new Array[Double](nLangs)
    var grams = 0
    @inline def allSpace(from: Int, until: Int): Boolean = {
      var k = from
      while (k < until) { if (cAt(text, k, len) != ' ') return false; k += 1 }
      true
    }
    val pk = packed
    @inline def add(h: Int): Unit = {
      val base = h * nLangs
      var k = 0
      while (k < nLangs) { scores(k) += pk(base + k); k += 1 }
      grams += 1
    }
    // incremental FNV: the 1/2/3-gram hashes at position i share a prefix
    // fold, so each position costs 3 folds and ONE new char read+lowercase
    // (rolling window) instead of 6 folds re-reading every char up to 6x.
    // Bit-identical hashes to the naive formulation (FNV is a sequential
    // fold), asserted against featurize by the golden tests.
    var c0 = ' '
    var c1 = cAt(text, 1, len)
    var i = 0
    while (i < len - 1) {
      var h = 0x811c9dc5
      h ^= c0.toInt; h *= 0x01000193
      if (c0 != ' ') add((h & Int.MaxValue) % dim)
      h ^= c1.toInt; h *= 0x01000193
      if (c0 != ' ' || c1 != ' ') add((h & Int.MaxValue) % dim)
      if (i < len - 2) {
        val c2 = cAt(text, i + 2, len)
        if (c0 != ' ' || c1 != ' ' || c2 != ' ') {
          h ^= c2.toInt; h *= 0x01000193
          add((h & Int.MaxValue) % dim)
        }
        c0 = c1; c1 = c2
      }
      i += 1
    }
    if (grams == 0) return ("und", 0.0)
    // trained-head logits: per-gram mean of the weight reads — EXACTLY
    // the (bias-free) function the training examples were fit on
    // (meanFeaturize), so inference and training agree
    var best = 0
    var k = 0
    while (k < nLangs) {
      scores(k) = scores(k) / grams
      if (scores(k) > scores(best)) best = k
      k += 1
    }
    // MARGIN-based confidence (round 4): two-way softmax on the top1-top2
    // logit margin, range [0.5, 1). The round-3 full softmax summed exp
    // terms over EVERY language, so adding languages mechanically dragged
    // confidence down and made the frozen min_langid_score threshold
    // |langs|-sensitive; the margin depends only on the two best-scoring
    // languages, so the threshold survives model growth. Temperature 1 —
    // trained logit margins are already on a natural softmax scale
    // (prose margins measured >= ~2, ambiguous mixed-script < ~0.5).
    var second = if (best == 0) 1 else 0
    k = 0
    while (k < nLangs) {
      if (k != best && scores(k) > scores(second)) second = k
      k += 1
    }
    val margin = scores(best) - scores(second)
    // StrictMath, not Math: Math.exp permits platform-dependent ulps, so on
    // a heterogeneous (x86+ARM) cluster a doc sitting exactly at the frozen
    // 0.51 threshold could flip keep/drop across executors. Training already
    // uses StrictMath for the same bit-determinism contract.
    (langs(best), 1.0 / (1.0 + StrictMath.exp(-margin)))
  }
}
